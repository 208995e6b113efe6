"""Generate the checked-in weights for TinyHashEmbedder
(crawl4ai_ray/models/tiny_embedder_v1.npz) — run once; the artifact is
committed so every environment loads identical weights (r4 VERDICT task
#3: a real recorded-weights kernel behind the embed seam, not a stub).

Model: hashed-ngram linear projection — unigram+bigram tokens hash into
_BUCKETS signed feature slots; the feature vector projects through W
(orthonormal columns, QR of a seeded Gaussian) and L2-normalizes. A
classical JL-projection text encoder: real weights on disk, loaded once
per actor, vectorized matmul inference.
"""

import os

import numpy as np

BUCKETS = 2048
DIM = 64
SEED = 0x7E5_C4A1


def main() -> None:
    rng = np.random.default_rng(SEED)
    g = rng.standard_normal((BUCKETS, DIM))
    # orthonormal columns: length-preserving projection directions
    q, _ = np.linalg.qr(g)
    w = q.astype(np.float32)
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "crawl4ai_ray",
        "models",
        "tiny_embedder_v1.npz",
    )
    np.savez_compressed(out, W=w, buckets=np.int64(BUCKETS), dim=np.int64(DIM))
    print(f"wrote {out}: W{w.shape} {w.dtype}, md5 of bytes follows")
    import hashlib

    print(hashlib.md5(open(out, "rb").read()).hexdigest())


if __name__ == "__main__":
    main()
