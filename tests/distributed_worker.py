"""Worker process for test_distributed.py: real jax.distributed
bring-up on localhost CPU (2 processes x 4 virtual devices), then one
global collective over the ray mesh.

Run: python distributed_worker.py <port> <process_id>
Prints DIST_OK <global_sum> on success.
"""
import os
import sys

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=4")
os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from raytracer_tpu.parallel.mesh import (RAY_AXIS, initialize_distributed,
                                         make_mesh)


def main():
    port, pid = int(sys.argv[1]), int(sys.argv[2])
    ok = initialize_distributed(coordinator_address=f"127.0.0.1:{port}",
                                num_processes=2, process_id=pid)
    assert ok, "initialize_distributed returned False for a real coordinator"
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 8, jax.device_count()
    assert jax.local_device_count() == 4, jax.local_device_count()

    mesh = make_mesh()          # global 8-device mesh spanning both procs
    assert mesh.devices.size == 8

    # one real cross-process collective: per-process shards -> global sum
    from jax.experimental import multihost_utils
    local = np.full((4,), 1.0 + pid, np.float32)      # proc0: 1s, proc1: 2s
    garr = multihost_utils.host_local_array_to_global_array(
        local, mesh, P(RAY_AXIS))
    total = jax.jit(jnp.sum)(garr)            # replicated global reduction
    got = float(np.asarray(multihost_utils.global_array_to_host_local_array(
        total, mesh, P())))
    assert got == 12.0, got     # 4*1 + 4*2
    print(f"DIST_OK {got}", flush=True)


if __name__ == "__main__":
    main()
