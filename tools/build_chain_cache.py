"""Build and persist a chain cache for the bench grid (setup work, not
timed - criterion likewise excludes chain construction from the measured
helpers, /root/reference/code/benches/acc.rs:76-98).

Usage: python tools/build_chain_cache.py [n] [k]   (default 16384 100)

Prints per-step progress so a service stall is visible; the cache file is
written atomically at the end (tmp + rename).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from halo_accumulation_tpu import runtime

runtime.init()

from halo_accumulation_tpu import acc as acc_mod, chain, pp as pp_mod

n = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
k = int(sys.argv[2]) if len(sys.argv) > 2 else 100

cache_dir = os.environ.get("HALO_BENCH_CHAIN_CACHE", ".chain_cache")
path = os.path.join(cache_dir, f"chain_{n}_{k}.bin")
if os.path.exists(path):
    d, qss, accs = chain.load_chain(path)
    if d == n - 1 and len(accs) == k:
        print(f"cache {path} already valid (d={d}, k={len(accs)})", flush=True)
        raise SystemExit(0)

pp = pp_mod.get_pp(n)
rng = np.random.default_rng(7)
d = n - 1
qss, accs = [], []
prev = None
t_all = time.time()
for i in range(k):
    t0 = time.time()
    q = chain.random_instance(rng, d, pp)
    qs = [prev.to_instance(), q] if prev is not None else [q]
    prev = acc_mod.prover(rng, d, qs, pp)
    qss.append(qs)
    accs.append(prev)
    print(f"step {i+1}/{k}: {time.time()-t0:.1f}s (total {time.time()-t_all:.0f}s)", flush=True)

tmp = path + ".tmp"
chain.save_chain(tmp, d, qss, accs)
os.replace(tmp, path)
print(f"saved {path} in {time.time()-t_all:.0f}s", flush=True)
