"""Fifty-fourth-wave tests: k-segmentation, exponential mechanism,
partial correlation."""

import hashlib
import math

import duckdb
import numpy as np

from crawl4ai_ray.pipelines.queries_wave54 import (
    _KSEG_D,
    q_exp_mechanism,
    q_ksegmentation,
    q_partial_correlation,
)


def test_ksegmentation_beats_binseg_and_is_argmin(ray_session, sf_dir):
    row = q_ksegmentation(sf_dir).to_pandas().iloc[0]
    con = duckdb.connect()
    series = con.execute(
        f"SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT)//3600 hb,"
        f" count(*) x FROM read_parquet('{sf_dir}/events.parquet')"
        f" GROUP BY hb ORDER BY hb"
    ).fetchall()
    x = np.array([int(v) for _, v in series], np.int64)
    T = len(x)
    assert row["n1"] + row["n2"] + row["n3"] == T
    sl = np.concatenate([[0], np.cumsum(x)])
    s2l = np.concatenate([[0], np.cumsum(x * x)])

    def cost(i, j):
        n = int(j - i)
        s = int(sl[j] - sl[i])
        s2 = int(s2l[j] - s2l[i])
        return (n * s2 - s * s) * _KSEG_D // n

    # brute-force the full (tau1, tau2) grid
    best = min(
        (cost(0, i) + cost(i, j) + cost(j, T), i, j)
        for i in range(1, T - 1)
        for j in range(i + 1, T)
    )
    assert row["cost_q"] == best[0]
    assert (row["n1"], row["n1"] + row["n2"]) == (best[1], best[2])
    # 2 cuts can never do worse than the single best cut
    best1 = min(cost(0, i) + cost(i, T) for i in range(1, T))
    assert row["cost_q"] <= best1


def test_exp_mechanism_draw_is_gumbel_argmax(ray_session, sf_dir):
    row = q_exp_mechanism(sf_dir).to_pandas().iloc[0]
    # recompute the noisy argmax over the SQL_PAGES host model
    con = duckdb.connect()
    n = con.execute(
        f"SELECT COUNT(*) FROM read_parquet('{sf_dir}/documents.parquet')"
    ).fetchone()[0]
    cnt: dict = {}
    for d in range(n):
        hid = 0 if d % 7 == 0 else d % 50
        h = f"site{hid}.example.com"
        cnt[h] = cnt.get(h, 0) + 1
    noisy = {}
    for h, c in cnt.items():
        h52 = int(hashlib.md5(f"em|{h}".encode()).hexdigest()[:13], 16)
        u = (float(h52) + 0.5) / 4503599627370496.0
        noisy[h] = float(c) / 2.0 + (-math.log(-math.log(u)))
    chosen = min(noisy, key=lambda h: (-noisy[h], h))
    assert row["chosen_host"] == chosen
    assert row["chosen_n"] == cnt[chosen]
    order = sorted(cnt.items(), key=lambda t: (-t[1], t[0]))
    assert row["true_best_host"] == order[0][0]
    # epsilon=1 with the heavy-hitter gap: winner should rank high
    assert 1 <= row["chosen_rank"] <= 5


def test_partial_correlation_bounds_and_recompute(ray_session, sf_dir):
    row = q_partial_correlation(sf_dir).to_pandas().iloc[0]
    con = duckdb.connect()
    docs = con.execute(
        f"SELECT text, n_chars FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    ).fetchdf()
    x = docs["n_chars"].to_numpy(np.int64)
    y = np.array([len(set(t.split())) for t in docs["text"]], np.int64)
    z = np.array([len(t.split()) for t in docs["text"]], np.int64)
    n = len(x)

    def r(a, b):
        cov = n * int((a * b).sum()) - int(a.sum()) * int(b.sum())
        va = n * int((a * a).sum()) - int(a.sum()) ** 2
        vb = n * int((b * b).sum()) - int(b.sum()) ** 2
        return float(cov) / math.sqrt(float(va) * float(vb))

    assert row["r_xy"] == r(x, y)
    assert row["r_xz"] == r(x, z)
    assert row["r_yz"] == r(y, z)
    assert -1.0 <= row["r_partial"] <= 1.0
    # chars~tokens is near-perfect, so controlling z must shrink the
    # raw chars~types association substantially
    assert row["r_xz"] > 0.95
    assert abs(row["r_partial"]) < abs(row["r_xy"])
