from rechorus_tpu.models.general import bprmf, buir, directau, lightgcn, neumf, pop  # noqa: F401
