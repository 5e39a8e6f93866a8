from rechorus_tpu.models.base import (
    BaseModel,
    GeneralModel,
    SequentialModel,
    CTRModel,
)
