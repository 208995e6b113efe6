"""Forty-seventh-wave tests: LRU miss-ratio curve, Bradley-Terry,
secretary admission."""

import hashlib

import duckdb
import numpy as np

from crawl4ai_ray.pipelines.queries_wave47 import (
    _BT_SCALE,
    _SEC_E_DEN,
    _SEC_E_NUM,
    q_bradley_terry,
    q_lru_mrc,
    q_secretary_admission,
)


def _brute_distances(pos, keys):
    """Reference Mattson: dict of last-seen + linear distinct count."""
    order = np.argsort(pos, kind="mergesort")
    keys = [keys[i] for i in order]
    dists = []
    seen_seq: list = []  # LRU stack, most recent first
    for k in keys:
        if k in seen_seq:
            d = seen_seq.index(k) + 1
            seen_seq.remove(k)
            dists.append(d)
        else:
            dists.append(-1)
        seen_seq.insert(0, k)
    return dists


def _events(sf_dir):
    con = duckdb.connect()
    df = con.execute(
        f"SELECT event_id, user_id FROM "
        f"read_parquet('{sf_dir}/events.parquet') ORDER BY event_id"
    ).fetchdf()
    return df["event_id"].to_numpy(), df["user_id"].to_numpy()


def test_lru_mrc_matches_brute_stack(ray_session, sf_dir):
    pos, keys = _events(sf_dir)
    brute = _brute_distances(pos, list(keys))
    vals, cnts = np.unique(np.array(brute), return_counts=True)
    expect = dict(zip(vals.tolist(), cnts.tolist()))
    df = q_lru_mrc(sf_dir).to_pandas()
    got = dict(zip(df["dist"], df["n"]))
    assert got == expect
    # inclusion property: hit ratio monotone nondecreasing, ends at
    # 1 - colds/total
    hr = df.sort_values("dist")["hit_ratio"].to_numpy()
    assert (np.diff(hr) >= 0).all()
    total = df["n"].sum()
    colds = int(df.loc[df["dist"] == -1, "n"].sum())
    assert abs(hr[-1] - (1 - colds / total)) < 1e-12
    assert total == len(pos)


def test_lru_mrc_shards_rate_is_subset_consistent(ray_session, sf_dir):
    """SHARDS key-hash sampling: distances on the sampled stream equal
    an exact recompute on the filtered stream (spatial sampling keeps
    every occurrence of a kept key, so per-key reuse windows shrink
    only by removed OTHER keys), then get the ×R rescale to full-stream
    units (r3 advice: sampled distances must not leak unscaled)."""
    import hashlib

    pos, keys = _events(sf_dir)
    keep = np.array(
        [
            int(hashlib.md5(f"mrc|{int(k)}".encode()).hexdigest()[:8], 16) % 2 == 0
            for k in keys
        ]
    )
    assert 0 < keep.sum() < len(keys)  # both sides non-trivial
    brute = _brute_distances(pos[keep], [k for k, m in zip(keys, keep) if m])
    vals, cnts = np.unique(np.array(brute), return_counts=True)
    expect = {
        (v * 2 if v >= 0 else v): c
        for v, c in zip(vals.tolist(), cnts.tolist())
    }
    df = q_lru_mrc(sf_dir, rate_num=1, rate_den=2).to_pandas()
    got = dict(zip(df["dist"], df["n"]))
    assert got == expect


def test_bradley_terry_wins_and_ranking(ray_session, sf_dir):
    df = q_bradley_terry(sf_dir).to_pandas()
    con = duckdb.connect()
    docs = con.execute(
        f"SELECT source, n_chars FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    ).fetchdf()
    srcs = sorted(docs["source"].unique())
    # brute-force duel count for one source against the field
    a = srcs[0]
    la = docs.loc[docs["source"] == a, "n_chars"].to_numpy()
    wins_a = 0
    for b in srcs[1:]:
        lb = docs.loc[docs["source"] == b, "n_chars"].to_numpy()
        wins_a += int((la[:, None] > lb[None, :]).sum())
    row = df.loc[df["source"] == a].iloc[0]
    assert row["wins"] == wins_a
    # strengths normalized to ~K*S (integer rescale rounds down)
    k = len(srcs)
    assert 0 <= k * _BT_SCALE - df["p_q"].sum() <= k
    # rank 1 holds the max strength; ranks are a permutation
    assert sorted(df["rank"]) == list(range(1, k + 1))
    assert (
        df.loc[df["rank"] == 1, "p_q"].iloc[0] == df["p_q"].max()
    )
    # more wins with the same duel count => no worse strength
    s = df.sort_values(["n_duels", "wins"])
    same = s.groupby("n_duels")
    for _, g in same:
        if len(g) > 1:
            assert (
                g.sort_values("wins")["p_q"].is_monotonic_increasing
                or g["wins"].nunique() == 1
            )


def test_secretary_rule_recompute(ray_session, sf_dir):
    df = q_secretary_admission(sf_dir).to_pandas()
    con = duckdb.connect()
    n = con.execute(
        f"SELECT COUNT(*) FROM read_parquet('{sf_dir}/documents.parquet')"
    ).fetchone()[0]
    # rebuild the per-host streams exactly like SQL_PAGES
    streams: dict = {}
    for doc_id in range(n):
        hid = 0 if doc_id % 7 == 0 else doc_id % 50
        host = f"site{hid}.example.com"
        url = f"https://{host}/page/{doc_id}"
        q = int(hashlib.md5(f"sec|{url}".encode()).hexdigest()[:12], 16)
        streams.setdefault(host, []).append((doc_id, q))
    assert set(df["host"]) == set(streams)
    for _, row in df.iterrows():
        st = sorted(streams[row["host"]])
        m = len(st)
        r = m * _SEC_E_NUM // _SEC_E_DEN
        assert row["m"] == m and row["r"] == r
        qs = [q for _, q in st]
        if r > 0:
            premax = max(qs[:r])
            later = [i for i in range(r, m) if qs[i] > premax]
            ci = later[0] if later else m - 1
        else:
            ci = 0
        assert row["chosen_doc"] == st[ci][0]
        bi = int(np.argmax(qs))
        assert row["best_doc"] == st[bi][0]
        assert row["success"] == int(ci == bi)
