"""Multi-host smoke test: 2 real processes over jax.distributed.

Spawns two CPU-backed python processes that initialise a shared
coordinator, build a global ('data','model') mesh over 2 hosts x 2 local
devices, and run one sharded computation with a cross-host reduction
(the same global-array pattern the training step uses). Validates the
SURVEY §2.5 multi-host path without TPUs.
"""

import os
import subprocess
import sys

import pytest

WORKER = r"""
import os, sys
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

pid = int(sys.argv[1])
jax.distributed.initialize(
    coordinator_address="127.0.0.1:45677", num_processes=2, process_id=pid
)
assert jax.process_count() == 2
assert len(jax.devices()) == 4  # global

from helping_hand_for_egocentric_videos_tpu.parallel import make_mesh

mesh = make_mesh(jax.devices(), model_parallel=2)  # (data=2, model=2)

# per-host local shard of a global (4, 8) batch: this host's data-axis
# shard, replicated over the local model-axis devices
local = np.full((2, 8), float(pid + 1), np.float32)
global_shape = (4, 8)
sharding = NamedSharding(mesh, P("data", None))
arrs = [jax.device_put(local, d) for d in jax.local_devices()]
garr = jax.make_array_from_single_device_arrays(global_shape, sharding, arrs)

@jax.jit
def f(x):
    return (x * 2).sum()

out = float(f(garr))
# sum = 2 * (2*8*1 + 2*8*2) = 96
assert abs(out - 96.0) < 1e-5, out
print(f"proc {pid} OK sum={out}", flush=True)
"""


@pytest.mark.skipif(
    os.environ.get("HH_SKIP_MULTIHOST") == "1", reason="disabled by env"
)
def test_two_process_distributed(tmp_path):
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    env = dict(os.environ)
    # set platform env BEFORE the interpreter starts: a sitecustomize may
    # import (and bind) jax before the worker script's first line runs
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    # the worker script lives under tmp_path, so the repo root must be on
    # PYTHONPATH explicitly (cwd is not added for script execution)
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in (repo_root, env.get("PYTHONPATH", "")) if p
    )
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(pid)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            env=env,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out.decode())
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-2000:]}"
        assert f"proc {pid} OK" in out


WORKER_PIPELINE = r"""
import os, sys
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

pid = int(sys.argv[1])
jax.distributed.initialize(
    coordinator_address="127.0.0.1:45679", num_processes=2, process_id=pid
)

from helping_hand_for_egocentric_videos_tpu.data.loader import ShardedSampler
from helping_hand_for_egocentric_videos_tpu.parallel import make_mesh

# per-host disjoint index shards of one global dataset
n, bs = 32, 4
sampler = ShardedSampler(
    n, bs, shuffle=True, host_id=jax.process_index(),
    num_hosts=jax.process_count(), seed=7,
)
sampler.set_epoch(3)
batches = list(sampler)
assert len(batches) == n // 2 // bs

mesh = make_mesh(jax.devices())  # data axis over 4 global devices
sharding = NamedSharding(mesh, P("data"))

# host-local batch -> this host's shard of the global batch (the training
# loop's global-array construction), then a global psum-style reduction
local = np.asarray(batches[0], np.float32)  # (4,) local indices as data
arrs = [
    jax.device_put(local.reshape(2, 2)[i], d)
    for i, d in enumerate(jax.local_devices())
]
garr = jax.make_array_from_single_device_arrays((8,), sharding, arrs)

total = float(jax.jit(lambda x: x.sum())(garr))
# both hosts compute the same global sum over the union of their shards;
# verify against a replay of the sampler for both hosts
s0 = ShardedSampler(n, bs, shuffle=True, host_id=0, num_hosts=2, seed=7)
s1 = ShardedSampler(n, bs, shuffle=True, host_id=1, num_hosts=2, seed=7)
s0.set_epoch(3); s1.set_epoch(3)
b0, b1 = list(s0)[0], list(s1)[0]
assert set(b0).isdisjoint(set(b1)), "host shards overlap"
want = float(np.sum(np.concatenate([b0, b1]).astype(np.float32)))
assert abs(total - want) < 1e-5, (total, want)
print(f"proc {pid} PIPELINE-OK total={total}", flush=True)
"""


@pytest.mark.skipif(
    os.environ.get("HH_SKIP_MULTIHOST") == "1", reason="disabled by env"
)
def test_two_process_input_pipeline(tmp_path):
    """Multi-host input rehearsal: per-host ShardedSampler shards are
    disjoint, and host-local batches assemble into one global sharded
    array whose reduction matches the union of both hosts' shards."""
    script = tmp_path / "worker_pipeline.py"
    script.write_text(WORKER_PIPELINE)
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in (repo_root, env.get("PYTHONPATH", "")) if p
    )
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(pid)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            env=env,
            cwd=repo_root,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out.decode())
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-2000:]}"
        assert f"proc {pid} PIPELINE-OK" in out
