"""Count-Min sketch (stages/cms.py): pinned bucket derivation, the
est >= exact guarantee, and distributed-merge == single-pass-fold."""

import hashlib
from collections import Counter

import numpy as np
import pyarrow as pa
import pytest

import ray

from crawl4ai_ray.stages import cms


def _values(n=3000):
    # skewed multiset: value_k appears ~ n/(k+1) times (Zipf-ish), plus a
    # long unique tail — exercises both heavy hitters and collisions
    vals = []
    for k in range(40):
        vals += [f"host{k}.example.com"] * (n // (k + 1) // 40 + 1)
    vals += [f"tail{i}.example.com" for i in range(200)]
    return vals


def test_bucket_derivation_pinned():
    v = "example.com"
    hx = hashlib.md5(v.encode()).hexdigest()
    expect = [int(hx[8 * d : 8 * d + 8], 16) % cms.CMS_WIDTH for d in range(4)]
    got = cms.cms_buckets([v]).tolist()[0]
    assert got == expect
    # exact value lock (md5('example.com') = 5ababd60...)
    assert got[0] == int("5ababd60", 16) % 64


def _fold_local(vals, depth=cms.CMS_DEPTH, width=cms.CMS_WIDTH):
    sk = np.zeros((depth, width), dtype=np.int64)
    bk = cms.cms_buckets(vals, depth, width)
    for d in range(depth):
        np.add.at(sk[d], bk[:, d], 1)
    return sk


def test_distributed_merge_equals_local_fold():
    vals = _values()
    ds = ray.data.from_arrow(pa.table({"v": vals})).repartition(7)
    sk = cms.build_cms(ds, "v")
    assert np.array_equal(sk, _fold_local(vals))
    # total mass per row == number of items
    assert (sk.sum(axis=1) == len(vals)).all()


def test_estimate_never_undercounts():
    vals = _values()
    sk = _fold_local(vals)
    exact = Counter(vals)
    keys = sorted(exact)
    est = cms.cms_estimate(sk, keys)
    ex = np.array([exact[k] for k in keys])
    assert (est >= ex).all()
    # with 240 distinct keys over 64 buckets collisions MUST happen
    assert (est > ex).any()
    # an absent key estimates only collision mass (may be 0)
    absent = cms.cms_estimate(sk, ["never-seen.example.org"])
    assert absent[0] >= 0


def test_empty_inputs():
    assert cms.cms_estimate(np.zeros((4, 64), np.int64), []).size == 0
    ds = ray.data.from_arrow(pa.table({"v": pa.array([], pa.string())}))
    assert cms.build_cms(ds, "v").sum() == 0
