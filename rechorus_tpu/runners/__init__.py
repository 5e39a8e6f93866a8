from rechorus_tpu.runners.base import BaseRunner
from rechorus_tpu.runners.ctr import CTRRunner
