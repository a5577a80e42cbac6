"""Multi-host scaffolding tests (SURVEY §2.4 DCN story / VERDICT r2 #7).

The real 2-process test spawns two fresh interpreters running
tests/multihost_worker.py over jax.distributed + gloo CPU collectives —
the same parallel/multihost.py path a pod-slice deployment takes, minus
the hardware.
"""
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_loader_sharding_disjoint_and_complete():
    """shard_id striding partitions each epoch disjointly across shards
    with identical shuffles (DistributedSampler semantics)."""
    from storygen_tpu.data.loader import DataLoader

    class Ds:
        def __len__(self):
            return 23

        def __getitem__(self, i):
            return {"image": np.full((2, 2, 3), i, np.float32)}

    shards = []
    for sid in range(3):
        dl = DataLoader(Ds(), batch_size=1, shuffle=True, seed=5,
                        num_threads=1, num_shards=3, shard_id=sid)
        shards.append(list(dl._epoch_indices()))
    flat = [i for s in shards for i in s]
    assert len(set(flat)) == 23  # disjoint and complete
    # same seed -> same permutation -> deterministic partition
    dl2 = DataLoader(Ds(), batch_size=1, shuffle=True, seed=5,
                     num_threads=1, num_shards=3, shard_id=1)
    assert list(dl2._epoch_indices()) == shards[1]


def test_initialize_noop_without_config(monkeypatch):
    from storygen_tpu.parallel import multihost
    for var in ("JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS",
                "JAX_NUM_PROCESSES", "JAX_PROCESS_ID"):
        monkeypatch.delenv(var, raising=False)
    assert multihost.initialize() is False


def test_two_process_cpu_data_parallel():
    """Two real processes, gloo CPU collectives, 4 global devices: the
    global-mesh mean and the replicated-param DP gradient must agree
    across processes and match a single-process oracle."""
    port = "29811"
    env = {k: v for k, v in os.environ.items()
           if not k.startswith(("JAX_", "XLA_"))}
    procs = [subprocess.Popen(
        [sys.executable, os.path.join(REPO, "tests", "multihost_worker.py"),
         str(rank), port],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
        cwd=REPO) for rank in (0, 1)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=300)
            outs.append(out.decode())
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("multihost workers timed out")
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out

    def grab(out, tag):
        for line in out.splitlines():
            if line.startswith(tag + " "):
                return float(line.split()[1])
        raise AssertionError(f"{tag} not found in:\n{out}")

    # oracle: global batch rows 0..7
    x = np.arange(8, dtype=np.float32)
    mean = x.mean()
    gradw = np.mean(2 * (x * 2.0 - 1.0) * x)
    for out in outs:
        assert grab(out, "MEAN") == pytest.approx(mean)
        assert grab(out, "GRADW") == pytest.approx(gradw, rel=1e-5)
