from rechorus_tpu.models.context import fm  # noqa: F401
