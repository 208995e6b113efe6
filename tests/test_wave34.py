"""Thirty-fourth-wave tests: SPRT, quantile normalization, gate order."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from crawl4ai_ray.pipelines.queries_wave34 import (
    _SPRT_LOWER_Q,
    _SPRT_UPPER_Q,
    q_gate_order_opt,
    q_quantile_normalize,
    q_sprt_abtest,
)


def test_sprt_decides_under_clear_signal(ray_session, tmp_path):
    # 10 days x 100 events, purchase rate 0.4 (>> p1=0.25) -> accept H1
    day = 86_400_000_000
    base = 1_600_000_000_000_000
    ts, uid, et = [], [], []
    for d in range(10):
        for i in range(100):
            ts.append(base + d * day + i * 1000)
            uid.append(1)  # odd -> in the tested arm
            et.append("purchase" if i % 5 < 2 else "view")  # rate 0.4
    tbl = pa.table(
        {
            "ts": pa.array(ts, pa.timestamp("us")),
            "user_id": pa.array(uid, pa.int64()),
            "event_type": pa.array(et, pa.string()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    df = q_sprt_abtest(str(tmp_path)).to_pandas().sort_values("day")
    assert df["stopped"].sum() == 1
    stop_row = df[df["stopped"] == 1].iloc[0]
    assert stop_row["decision"] == 1  # H1 accepted
    # after first crossing LLR keeps growing with rate 0.4
    assert df.iloc[-1]["llr_q"] >= _SPRT_UPPER_Q


def test_sprt_llr_identity(ray_session, sf_dir):
    df = q_sprt_abtest(sf_dir).to_pandas()
    from crawl4ai_ray.pipelines.queries_wave34 import _SPRT_L0Q, _SPRT_L1Q

    llr = df["x_cum"] * _SPRT_L1Q + (df["n_cum"] - df["x_cum"]) * _SPRT_L0Q
    assert (llr == df["llr_q"]).all()
    assert df["stopped"].sum() <= 1
    assert df["decision"].isin([-1, 0, 1]).all()
    assert _SPRT_LOWER_Q < 0 < _SPRT_UPPER_Q


def test_quantile_normalize_aligns_sources(ray_session, sf_dir):
    df = q_quantile_normalize(sf_dir).to_pandas()
    assert len(df) == 500
    # normalized values come from the global value set
    assert set(df["n_chars_norm"]) <= set(df["n_chars"])
    # after normalization the per-source medians collapse together
    med = df.groupby("source")["n_chars_norm"].median()
    raw = df.groupby("source")["n_chars"].median()
    assert med.max() - med.min() <= raw.max() - raw.min()
    # monotone within source: higher raw rank -> >= normalized value
    for _, g in df.groupby("source"):
        g = g.sort_values(["n_chars", "doc_id"])
        assert (np.diff(g["n_chars_norm"]) >= 0).all()


def test_gate_order_ranked_by_rejection(ray_session, sf_dir):
    df = q_gate_order_opt(sf_dir).to_pandas().sort_values("rank")
    assert len(df) == 5
    assert (np.diff(df["n_reject"]) <= 0).all()
    assert ((df["reject_rate"] >= 0) & (df["reject_rate"] <= 1)).all()
    assert set(df["gate"]) == {
        "ok_word_count", "ok_mean_len", "ok_symbol", "ok_alpha", "ok_stop"
    }
