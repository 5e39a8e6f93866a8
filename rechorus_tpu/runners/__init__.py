from rechorus_tpu.runners.base import BaseRunner
from rechorus_tpu.runners.buir import BUIRRunner
from rechorus_tpu.runners.ctr import CTRRunner
from rechorus_tpu.runners.impression import ImpressionRunner
