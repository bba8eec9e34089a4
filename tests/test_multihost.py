"""Multi-host distributed kernels: 2 jax.distributed processes x 4 CPU
devices each, one 8-device global mesh spanning the process boundary.

Proves the engine's collective kernels (parallel/shard.py exchange join,
sharded ORDER BY) do not assume a single process: the all_to_all /
psum / pmax collectives run across processes and produce results
identical to a single-process host-side oracle. This is the CPU
simulation of SURVEY §4's multi-host testing strategy (the DCN analog of
the reference's multi-machine deployments).
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import sys
import jax
jax.config.update("jax_platforms", "cpu")
coord, pid = sys.argv[1], int(sys.argv[2])
jax.distributed.initialize(coordinator_address=coord, num_processes=2,
                           process_id=pid)
sys.path.insert(0, {root!r})
import numpy as np
import jax.numpy as jnp
from jax.experimental import multihost_utils
from duckdb_tpu.parallel import shard

devs = jax.devices()
assert len(devs) == 8, f"expected 8 global devices, got {{len(devs)}}"
assert jax.process_count() == 2

n = 8
rng = np.random.default_rng(7)
NP, NB = 4096, 1024
pk = rng.integers(0, 2000, NP).astype(np.int64)
bk = rng.permutation(2000)[:NB].astype(np.int64)  # unique build keys
p_live = rng.random(NP) < 0.9
b_live = rng.random(NB) < 0.9
p_rows = np.arange(NP, dtype=np.int32)
b_rows = np.arange(NB, dtype=np.int32)

cap_p, cap_b = 2048, 512
fn = shard.get_exchange_join(n, cap_p, cap_b)
out = fn(jnp.asarray(pk), jnp.asarray(p_live), jnp.asarray(p_rows),
         jnp.asarray(bk), jnp.asarray(b_live), jnp.asarray(b_rows))
rp_r, brow, overflow, _, _ = out
rp_r = multihost_utils.process_allgather(rp_r, tiled=True)
brow = multihost_utils.process_allgather(brow, tiled=True)
overflow = int(np.asarray(overflow.addressable_shards[0].data).reshape(-1)[0])
assert overflow == 0, f"exchange overflow {{overflow}}"

# host oracle: for every live probe row, its unique matching build row
lut = {{int(k): int(r) for k, r, lv in zip(bk, b_rows, b_live) if lv}}
want = {{int(r): lut.get(int(k), -1)
        for k, r, lv in zip(pk, p_rows, p_live) if lv}}
got = {{}}
for r, b in zip(np.asarray(rp_r), np.asarray(brow)):
    if int(r) >= 0:
        got[int(r)] = int(b)
assert set(got) == set(want), "routed probe row set mismatch"
for r in want:
    assert got[r] == want[r], (r, got[r], want[r])

# sharded ORDER BY across the process boundary
cap = 2048
keys = rng.integers(-10_000, 10_000, 4096).astype(np.int64)
live = rng.random(4096) < 0.85
rows = np.arange(4096, dtype=np.int32)
sfn = shard.get_sharded_sort(n, cap)
rr, rl, drop, _need = sfn(jnp.asarray(keys)[None], jnp.asarray(live),
                          jnp.asarray(rows))
rr = np.asarray(multihost_utils.process_allgather(rr, tiled=True))
rl = np.asarray(multihost_utils.process_allgather(rl, tiled=True))
drop = int(np.asarray(drop.addressable_shards[0].data).reshape(-1)[0])
assert drop == 0
got_order = [int(r) for r, l in zip(rr, rl) if l and int(r) >= 0]
want_order = sorted((int(r) for r, lv in zip(rows, live) if lv),
                    key=lambda r: (int(keys[r]), r))
assert got_order == want_order, "sharded sort order mismatch"
print(f"proc {{pid}} OK", flush=True)
"""


def test_two_process_exchange_join_and_sort(tmp_path):
    port = socket.socket()
    port.bind(("127.0.0.1", 0))
    addr = f"127.0.0.1:{port.getsockname()[1]}"
    port.close()
    script = tmp_path / "worker.py"
    script.write_text(WORKER.format(root=ROOT))
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    procs = [subprocess.Popen([sys.executable, str(script), addr, str(i)],
                              stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, text=True, env=env)
             for i in range(2)]
    outs = [p.communicate(timeout=560)[0] for p in procs]
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-2000:]}"
        assert f"proc {i} OK" in out
