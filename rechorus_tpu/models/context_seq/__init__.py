from rechorus_tpu.models.context_seq import can, dien, din, eta, sdim  # noqa: F401
