"""Eleventh-wave operator unit tests: skyline prune, host boilerplate,
Heaps fit, lang/source PMI."""

import math

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

import ray

from crawl4ai_ray.pipelines.queries_wave11 import (
    _skyline_prune,
    q_host_boilerplate,
    q_lang_source_mi,
    q_pareto_docs,
)


def _brute_skyline(nd, nt):
    keep = []
    for i in range(len(nd)):
        dominated = any(
            nd[j] >= nd[i]
            and nt[j] <= nt[i]
            and (nd[j] > nd[i] or nt[j] < nt[i])
            for j in range(len(nd))
        )
        keep.append(not dominated)
    return np.array(keep, bool)


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 12), st.integers(0, 12)),
        min_size=1,
        max_size=40,
    )
)
def test_skyline_prune_matches_bruteforce(pts):
    nd = np.array([p[0] for p in pts], np.int64)
    nt = np.array([p[1] for p in pts], np.int64)
    assert (_skyline_prune(nd, nt) == _brute_skyline(nd, nt)).all()


def test_skyline_duplicates_all_survive():
    nd = np.array([5, 5, 3], np.int64)
    nt = np.array([2, 2, 9], np.int64)
    keep = _skyline_prune(nd, nt)
    assert keep.tolist() == [True, True, False]


def test_pareto_docs_members_not_dominated(ray_session, sf_dir):
    sky = q_pareto_docs(sf_dir).to_pandas()
    assert len(sky) >= 1
    # no member dominates another (skyline is an antichain)
    nd, nt = sky["n_distinct"].to_numpy(), sky["n_tok"].to_numpy()
    assert _brute_skyline(nd, nt).all()


def test_host_boilerplate_planted(ray_session, tmp_path):
    """Docs 0,7,14 land on host 0 (doc_id%7==0 rule) and share the window
    'nav bar'; with min_df=3 that window is boilerplate on host 0 only."""
    rows = []
    for did in (0, 7, 14):
        rows.append({"doc_id": did, "text": "nav bar unique" + str(did) + " tail"})
    # host 1 doc shares the same words but is alone on its host
    rows.append({"doc_id": 1, "text": "nav bar solo here"})
    pa.parquet.write_table(
        pa.Table.from_pylist(rows), str(tmp_path / "documents.parquet")
    )
    out = q_host_boilerplate(str(tmp_path)).to_pandas().set_index("doc_id")
    # width=2 windows: ('nav bar', 'uniqueN tail') for host-0 docs
    for did in (0, 7, 14):
        assert out.loc[did, "n_seg"] == 2
        assert out.loc[did, "n_boiler"] == 1
        assert out.loc[did, "boiler_frac"] == pytest.approx(0.5)
    assert out.loc[1, "n_boiler"] == 0


def test_lang_source_mi_cells_consistent(ray_session, sf_dir):
    df = q_lang_source_mi(sf_dir).to_pandas()
    n = int(df["n"].iloc[0])
    assert int(df["n_ls"].sum()) == n
    # marginals really are marginals
    for lang, grp in df.groupby("lang"):
        assert int(grp["n_ls"].sum()) == int(grp["n_l"].iloc[0])
    # pmi recomputes from the integer columns
    row = df.iloc[0]
    assert row["pmi"] == pytest.approx(
        math.log(row["n"] * row["n_ls"] / (row["n_l"] * row["n_s"]))
    )
