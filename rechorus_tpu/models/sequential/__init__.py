from rechorus_tpu.models.sequential import (  # noqa: F401
    caser,
    comirec,
    fpmc,
    gru4rec,
    narm,
    sasrec,
)
