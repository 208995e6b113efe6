"""Sixty-third-wave tests: energy distance, peak concurrency,
successive halving."""

import duckdb
import numpy as np

from crawl4ai_ray.pipelines.queries_wave63 import (
    _PC_GAP_US,
    _SH_ROUNDS,
    _W63_Q,
    _sh_reward,
    q_energy_distance,
    q_peak_concurrency,
    q_successive_halving,
)


def test_energy_distance_matches_quadratic_brute(ray_session, sf_dir):
    row = q_energy_distance(sf_dir).to_pandas().iloc[0]
    con = duckdb.connect()
    docs = con.execute(
        f"SELECT lang, n_chars FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    ).fetchdf()
    a = docs.loc[docs["lang"] == "en", "n_chars"].to_numpy(np.int64)
    b = docs.loc[docs["lang"] != "en", "n_chars"].to_numpy(np.int64)
    sxy = int(np.abs(a[:, None] - b[None, :]).sum())
    sxx = int(np.abs(a[:, None] - a[None, :]).sum())
    syy = int(np.abs(b[:, None] - b[None, :]).sum())
    assert row["s_xy"] == sxy and row["s_xx"] == sxx
    assert row["s_yy"] == syy
    m, n = len(a), len(b)
    assert row["e_q"] == (
        (2 * sxy * m * n - sxx * n * n - syy * m * m)
        * _W63_Q
        // (m * m * n * n)
    )
    # energy distance is nonneg (it's a metric between distributions)
    assert row["e_q"] >= 0


def test_peak_concurrency_matches_brute_sweep(ray_session, sf_dir):
    row = q_peak_concurrency(sf_dir).to_pandas().iloc[0]
    con = duckdb.connect()
    ev = con.execute(
        f"SELECT user_id, epoch_us(ts) AS us FROM "
        f"read_parquet('{sf_dir}/events.parquet') ORDER BY user_id, us"
    ).fetchdf()
    deltas: dict = {}
    n_sess = 0
    for _, g in ev.groupby("user_id"):
        ts = g["us"].to_numpy(np.int64)
        start = ts[0]
        prev = ts[0]
        for t in ts[1:]:
            if t - prev > _PC_GAP_US:
                deltas[start] = deltas.get(start, 0) + 1
                deltas[prev + 1] = deltas.get(prev + 1, 0) - 1
                n_sess += 1
                start = t
            prev = t
        deltas[start] = deltas.get(start, 0) + 1
        deltas[prev + 1] = deltas.get(prev + 1, 0) - 1
        n_sess += 1
    run = peak = 0
    t_peak = None
    for t in sorted(deltas):
        run += deltas[t]
        if run > peak:
            peak, t_peak = run, t
    assert row["n_sessions"] == n_sess
    assert row["peak"] == peak and row["t_peak_us"] == t_peak
    # peak can't exceed the user count and must be positive
    assert 1 <= peak <= ev["user_id"].nunique()


def test_successive_halving_finds_top_tier_arm(ray_session, sf_dir):
    df = q_successive_halving(sf_dir).to_pandas()
    assert df["winner"].sum() == 1
    w = df.loc[df["winner"] == 1].iloc[0]
    hid = int(w["host"].split(".")[0][4:])
    # the planted mean offset is 200*(host_id%5): the winner must come
    # from the top tier (id%5 == 4)
    assert hid % 5 == 4
    # survivors halve each round: counts by survival round
    by_round = df.groupby("survived_rounds").size()
    assert by_round.loc[_SH_ROUNDS] >= 1
    # pull accounting: eliminated-in-round-r arms spent the cumulative
    # budget through round r
    cum = {1: 2, 2: 6, 3: 14, 4: 30}
    for _, r in df.iterrows():
        assert r["pulls"] == cum[int(r["survived_rounds"])]
        # reward sums recompute exactly
        h = int(r["host"].split(".")[0][4:])
        assert r["reward_sum"] == sum(
            _sh_reward(h, i) for i in range(int(r["pulls"]))
        )
