from rechorus_tpu.models.sequential import (  # noqa: F401
    caser,
    contrarec,
    chorus,
    comirec,
    fpmc,
    gru4rec,
    kda,
    narm,
    sasrec,
    timirec,
    tisasrec,
    slrcplus,
)
