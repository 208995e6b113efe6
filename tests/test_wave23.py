"""Twenty-third-wave operator unit tests: lang-id confusion matrix,
split KS balance test."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from crawl4ai_ray.pipelines.queries_wave23 import (
    q_lang_confusion,
    q_split_ks_test,
)


def test_lang_confusion_hand(ray_session, tmp_path):
    # unmistakably english / french / empty docs with metadata labels
    rows = [
        ("en", "the cat and the dog is in the house for it"),
        ("en", "zz qq ww"),  # no stopwords of any lang -> 'unknown'
        ("fr", "le chat et la maison est une pour les des"),
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array(range(3), pa.int64()),
            "lang": pa.array([r[0] for r in rows], pa.string()),
            "text": pa.array([r[1] for r in rows], pa.string()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    df = q_lang_confusion(str(tmp_path)).to_pandas()
    m = {
        (r.lang_true, r.lang_pred): int(r.n) for r in df.itertuples()
    }
    assert m[("en", "en")] == 1
    assert m[("en", "unknown")] == 1
    assert m[("fr", "fr")] == 1
    assert sum(m.values()) == 3


def test_lang_confusion_totals(ray_session, sf_dir):
    df = q_lang_confusion(sf_dir).to_pandas()
    assert df["n"].sum() == 500
    # the synthetic corpus text is English-like vocab for every metadata
    # lang, so the matrix records exactly that confusion: predictions
    # collapse onto {en, unknown} — which is the point of the audit
    # (it MEASURES the gap, it does not assume the labels are right).
    assert set(df["lang_pred"]) <= {"en", "unknown"}
    # every metadata lang appears as a true row
    assert set(df["lang_true"]) == {"de", "en", "es", "fr", "zh"}


def test_split_ks_properties(ray_session, sf_dir):
    row = q_split_ks_test(sf_dir).to_pandas().iloc[0]
    assert row["n_train"] + row["n_val"] == 500
    assert 0.0 <= row["ks"] <= 1.0
    # a hash split of iid lengths should be well-balanced
    assert row["ks"] < 0.35
    assert row["d_num"] <= row["n_train"] * row["n_val"]


def test_split_ks_detects_skew(ray_session, tmp_path):
    # engineer doc_ids so one split gets short docs, the other long:
    # find ids landing in each split parity and assign lengths by split
    MULT, INC, SEED, SH = (
        6364136223846793005,
        1442695040888963407,
        7,
        16,
    )
    ids = np.arange(200, dtype=np.uint64)
    shard = (ids * np.uint64(MULT) + np.uint64(INC) + np.uint64(SEED)) % np.uint64(SH)
    split = (shard >= SH // 2).astype(int)
    n_chars = np.where(split == 0, 100, 1000)  # maximally skewed
    tbl = pa.table(
        {
            "doc_id": pa.array(ids.astype(np.int64), pa.int64()),
            "n_chars": pa.array(n_chars.astype(np.int64), pa.int64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    row = q_split_ks_test(str(tmp_path)).to_pandas().iloc[0]
    assert row["ks"] == 1.0  # disjoint supports -> maximal KS
