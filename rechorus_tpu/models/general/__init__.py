from rechorus_tpu.models.general import bprmf, neumf, pop  # noqa: F401
