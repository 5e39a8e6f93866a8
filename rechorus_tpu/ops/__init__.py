from rechorus_tpu.ops import losses, metrics
