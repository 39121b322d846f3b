"""Worker process for the multi-process distributed test.

Usage: python tests/mp_worker.py <process_id> <num_processes> <port>

Each process owns 4 virtual CPU devices; together they form the 8-device
('pairs',) global mesh. Exercises the REAL multi-host wiring
(jax.distributed coordinator handshake, global mesh construction,
per-host batch slicing, make_array_from_process_local_data) that the
single-process 8-device tests cannot reach — SURVEY.md §4's
"multi-host tests without a pod".
"""

import os
import sys


def main() -> int:
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))

    import jax
    jax.config.update("jax_platforms", "cpu")

    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from quatro_tpu.io.synthetic import make_correspondences
    from quatro_tpu.parallel.distributed import (global_pairs_mesh,
                                                 initialize_multihost,
                                                 local_batch_slice)
    from quatro_tpu.parallel.sharding import sharded_register_batch

    initialize_multihost(f"127.0.0.1:{port}", num_processes=nproc,
                         process_id=pid)
    assert jax.process_count() == nproc, jax.process_count()
    mesh = global_pairs_mesh()
    n_dev = len(jax.devices())
    assert n_dev == 4 * nproc, n_dev

    # one pair per global device; every process builds the same host data
    # and feeds only its slice
    b = n_dev
    pairs = [make_correspondences(seed=s, n_inliers=30, n_outliers=98)
             for s in range(b)]
    src = np.stack([p[0] for p in pairs]).astype(np.float32)
    tgt = np.stack([p[1] for p in pairs]).astype(np.float32)
    gts = np.stack([p[2] for p in pairs]).astype(np.float32)
    mask = np.ones(src.shape[:2], bool)

    sl = local_batch_slice(b)
    sh = NamedSharding(mesh, P("pairs"))

    def globalize(host_array):
        return jax.make_array_from_process_local_data(
            sh, np.ascontiguousarray(host_array[sl]), host_array.shape)

    sols = sharded_register_batch(mesh)(
        globalize(src), globalize(tgt), globalize(mask))
    jax.block_until_ready(sols.valid)

    # every process checks ITS addressable shards against ground truth
    for shard in sols.translation.addressable_shards:
        (row, *_rest) = shard.index
        k = row.start if row.start is not None else 0
        t_gt = gts[k][:3, 3]
        err = float(np.linalg.norm(np.asarray(shard.data)[0] - t_gt))
        assert err < 0.1, f"pair {k}: t err {err}"
    for shard in sols.valid.addressable_shards:
        assert bool(np.asarray(shard.data).all())

    print(f"proc {pid}: OK "
          f"({len(sols.valid.addressable_shards)} local pair shards)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
