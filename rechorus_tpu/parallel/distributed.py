"""Multi-host (multi-process) initialization + host-local data placement.

The reference is strictly single-process (SURVEY.md §2). Here a run
becomes multi-host by launching the SAME CLI once per host with
--dist_coordinator host:port --dist_num_processes N --dist_process_id i
(or the standard JAX env/TPU auto-detection with no flags at all on
Cloud TPU pods). Every host:

  * loads the same corpus and seeds the same permutation -- the
    per-epoch batch-index matrix is identical everywhere, and
    `global_put` (parallel.mesh) serves each host's addressable shards
    from it, so batches are host-sharded with zero communication;
  * runs the same jitted epoch; XLA GSPMD inserts the cross-host
    collectives for gradient psum / row-sharded table exchange.
"""
from __future__ import annotations

import logging
import os


def parse_dist_args(parser):
    parser.add_argument("--dist_coordinator", type=str, default="",
                        help="host:port of process 0. Empty = single-process "
                             "(or JAX auto-detection on TPU pods).")
    parser.add_argument("--dist_num_processes", type=int, default=0,
                        help="Total processes in the job (with --dist_coordinator).")
    parser.add_argument("--dist_process_id", type=int, default=-1,
                        help="This process's id (with --dist_coordinator).")
    return parser


def maybe_initialize(args) -> bool:
    """jax.distributed.initialize when multi-host flags/env are present.

    Must run before any other JAX call. Returns True if initialized."""
    coord = getattr(args, "dist_coordinator", "") or os.environ.get("RECHORUS_COORDINATOR", "")
    if not coord:
        return False
    import jax

    n = int(getattr(args, "dist_num_processes", 0)
            or os.environ.get("RECHORUS_NUM_PROCESSES", 0))
    pid = int(getattr(args, "dist_process_id", -1))
    if pid < 0:
        pid = int(os.environ.get("RECHORUS_PROCESS_ID", -1))
    jax.distributed.initialize(coordinator_address=coord, num_processes=n or None,
                               process_id=pid if pid >= 0 else None)
    logging.info("jax.distributed: process %d/%d, %d local / %d global devices",
                 jax.process_index(), jax.process_count(),
                 jax.local_device_count(), jax.device_count())
    return True
