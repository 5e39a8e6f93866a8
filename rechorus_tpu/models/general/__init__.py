from rechorus_tpu.models.general import bprmf, buir, cfkg, directau, lightgcn, neumf, pop  # noqa: F401
