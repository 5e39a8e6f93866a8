from rechorus_tpu.models.reranker import mir, prm, setrank  # noqa: F401
