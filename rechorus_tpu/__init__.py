"""ReChorus-TPU: a TPU-native recommender framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of ReChorus 2.0
(THUwangcy/ReChorus): top-k recommendation (general / sequential /
context-aware), CTR prediction, impression-based ranking and re-ranking.

Architecture (TPU-first, not a port):
  - Readers parse CSVs on host into frozen numpy `Corpus` objects
    (reference: src/helpers/*Reader.py).
  - Corpora are placed on device ONCE as fixed-shape arrays; batches are
    assembled inside jitted steps by index gather -- no per-step
    host->device transfer (reference instead uses torch DataLoader with
    worker processes, src/helpers/BaseRunner.py:182).
  - Negative sampling, the anti-position-leak permutation, losses and
    metrics run on device (reference does these on host in numpy,
    src/models/BaseModel.py:206-214, src/helpers/BaseRunner.py:187-202).
  - Whole epochs run as a single `lax.scan` over batch indices.
  - Models are flax.linen modules returning {'prediction': ...} from a
    feed dict of arrays; params are pytrees shardable over a
    ('data', 'model') jax.sharding.Mesh (embedding tables row-sharded
    over 'model', dense towers replicated, gradients psum over 'data').
"""

__version__ = "0.1.0"
