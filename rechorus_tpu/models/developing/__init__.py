from rechorus_tpu.models.developing import clrec, fourierta, s3rec, srgnn  # noqa: F401
