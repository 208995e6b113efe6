"""SHARDS-sampled LRU miss-ratio curve at scale.

Evidences the wave-47 lru_mrc scale path: spatial key-hash sampling
(Waldspurger et al., FAST'15) makes the Mattson stack-distance
computation tractable at ANY stream size — reuse distances computed on
the key-sampled substream are exactly the distances the full stream
would give those keys, scaled 1/R in COUNT. The demo

1. generates a large synthetic access stream distributed (splitmix64
   keys, 80/20 hot/cold mix — NOT md5, per the synthetic-data gotcha:
   no SQL oracle mirrors this, so the decorrelated generator is the
   right one);
2. computes the exact sampled-stream MRC with the wave-47 machinery
   (groupby occurrence lists -> searchsorted distance batches);
3. validates on a smaller control stream that the sampled MRC matches
   the EXACT full-stream MRC pointwise within the expected sampling
   error.

Usage: python scripts/mrc_scale_demo.py [n_accesses] [rate_den]
"""

from __future__ import annotations

import resource
import sys
import time

import numpy as np
import pyarrow as pa

import ray

K_COLD = 1_000_000
K_HOT = 1_000


def _splitmix64(x: np.ndarray) -> np.ndarray:
    x = (x + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
    z = x
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _keys_of(pos: np.ndarray) -> np.ndarray:
    h = _splitmix64(pos.astype(np.uint64))
    hot = (h % np.uint64(5)) == 0  # 20% of accesses
    h2 = _splitmix64(h)
    cold_keys = np.uint64(K_HOT) + (h2 % np.uint64(K_COLD))
    hot_keys = h2 % np.uint64(K_HOT)
    return np.where(hot, hot_keys, cold_keys).astype(np.int64)


def sampled_mrc(n: int, rate_den: int):
    """(distances histogram, accesses seen, sampled rows) — distances
    computed EXACTLY on the key-sampled substream, counts scale 1/R."""
    stream = ray.data.range(n)

    def sample(batch: pa.Table) -> pa.Table:
        pos = batch.column("id").to_numpy(zero_copy_only=False)
        keys = _keys_of(pos)
        keep = (
            _splitmix64((keys + 7777).astype(np.uint64))
            % np.uint64(rate_den)
        ) == 0
        return pa.table(
            {
                "pos": pa.array(pos[keep], pa.int64()),
                "key": pa.array(keys[keep], pa.int64()),
            }
        )

    samp = stream.map_batches(sample, batch_format="pyarrow")
    # SHARDS contract: the key-sampled substream is SMALL by
    # construction — collect once and build occurrence runs with ONE
    # vectorized lexsort (NOT groupby.map_groups: 1-2 ms/group kills
    # million-key exact runs, the known per-group-overhead gotcha)
    tbl = pa.concat_tables(
        [b for b in samp.iter_batches(batch_format="pyarrow")]
    )
    pos = tbl.column("pos").to_numpy(zero_copy_only=False)
    key = tbl.column("key").to_numpy(zero_copy_only=False)
    n_rows = len(pos)
    n_cold = len(np.unique(key))
    hist: dict = {}
    if n_rows:
        # exact Mattson on the sampled stream: offline sweep with a
        # Fenwick tree over positions (O(m log m), sequential but the
        # sample is small)
        m = len(pos)
        order_t = np.argsort(pos, kind="mergesort")
        spos = pos[order_t]
        skey = key[order_t]
        last_seen: dict = {}
        bit = np.zeros(m + 1, np.int64)

        def bit_add(i, v):
            i += 1
            while i <= m:
                bit[i] += v
                i += i & (-i)

        def bit_sum(i):  # prefix sum of [0, i]
            i += 1
            s = 0
            while i > 0:
                s += bit[i]
                i -= i & (-i)
            return s

        dists = []
        for t in range(m):
            k = int(skey[t])
            if k in last_seen:
                j = last_seen[k]
                # distinct keys since previous access = active marks
                # in (j, t)
                d = bit_sum(t - 1) - bit_sum(j)
                dists.append(d + 1)
                bit_add(j, -1)
            bit_add(t, 1)
            last_seen[k] = t
        vals, cnts = np.unique(np.array(dists), return_counts=True)
        hist = dict(zip(vals.tolist(), cnts.tolist()))
    hist[-1] = n_cold
    return hist, n_rows


def mrc_curve(hist: dict, scale: int, cache_sizes):
    """hit ratio at each cache size, distances scaled by the SHARDS
    factor (a distance d on the sampled stream corresponds to ~d*R
    distinct keys on the full stream)."""
    total = sum(hist.values())
    out = {}
    for c in cache_sizes:
        hits = sum(
            v
            for k, v in hist.items()
            if k >= 0 and k * scale <= c
        )
        out[c] = hits / total
    return out


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000_000
    rate_den = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False)
    sizes = [1_000, 10_000, 100_000, 500_000, 1_000_000]

    # control: exact vs sampled on a smaller stream
    t0 = time.time()
    exact_hist, exact_rows = sampled_mrc(2_000_000, 1)
    t_exact = time.time() - t0
    t0 = time.time()
    ctrl_hist, ctrl_rows = sampled_mrc(2_000_000, 64)
    t_ctrl = time.time() - t0
    ex = mrc_curve(exact_hist, 1, sizes)
    ct = mrc_curve(ctrl_hist, 64, sizes)
    err = max(abs(ex[c] - ct[c]) for c in sizes)
    print(
        f"control n=2e6: exact rows={exact_rows} ({t_exact:.1f}s), "
        f"sampled/64 rows={ctrl_rows} ({t_ctrl:.1f}s), "
        f"max |MRC delta| over {sizes} = {err:.4f}"
    )
    for c in sizes:
        print(f"  cache={c:>9}: exact={ex[c]:.4f} sampled={ct[c]:.4f}")

    # scale leg
    t0 = time.time()
    hist, rows = sampled_mrc(n, rate_den)
    wall = time.time() - t0
    big = mrc_curve(hist, rate_den, sizes)
    rss = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    print(
        f"scale n={n:.0e} rate=1/{rate_den}: sampled rows={rows}, "
        f"wall={wall:.1f}s ({n / wall / 1e6:.1f}M accesses/s), "
        f"driver maxrss={rss:.2f} GB"
    )
    for c in sizes:
        print(f"  cache={c:>9}: hit_ratio={big[c]:.4f}")
    ray.shutdown()


if __name__ == "__main__":
    main()
