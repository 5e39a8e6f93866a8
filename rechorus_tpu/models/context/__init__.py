from rechorus_tpu.models.context import (  # noqa: F401
    afm,
    autoint,
    dcn,
    dcnv2,
    deepfm,
    finalmlp,
    fm,
    sam,
    widedeep,
    xdeepfm,
)
