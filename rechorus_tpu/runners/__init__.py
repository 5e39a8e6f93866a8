from rechorus_tpu.runners.base import BaseRunner
