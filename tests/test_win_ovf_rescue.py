"""Regression: the lite path's window-truncation detector must be
computed per band. The wide-band rescue row runs at bw_long
(lchain.rs:321-330) where a predecessor beyond the window cap is far more
likely to be in band; a detector that only checks the NORMAL band's
max_dist_x lets a silently truncated wide-band chain ship.

The read below is engineered so that
  * the normal-band best chain covers little of the query -> rescue fires,
  * the wide-band best chain needs a predecessor more than `window` slots
    back whose distance is inside bw_long but OUTSIDE the normal
    max_dist_x (so a normal-band-only detector stays silent), and
  * no 64 consecutive anchor slots span <= the normal max_dist_x
    (so the normal-band detector really does stay silent).
"""

import numpy as np
import pytest

pytest.importorskip("jax")

from minimap2_rs_tpu.config import ChainParams, IndexParams, MapParams
from minimap2_rs_tpu.models.mapper import Mapper
from minimap2_rs_tpu.oracle.index import build_index
from minimap2_rs_tpu.oracle.pipeline import map_reads
from minimap2_rs_tpu.utils.seqsim import random_genome

W, K = 10, 15


def _engineered_read(genome: bytes) -> bytes:
    """[400bp seg1][2.75kb of reverse-ordered genome snippets][400bp seg2];
    seg1..seg2 genomic gap 1500 (> max_dist_x 200, <= bw_long 3000).

    The 50 overlapping 40bp snippets tile genome[10564:11780] in
    DESCENDING genome order as query position increases, producing ~220
    "filler" anchors whose x slots sit between seg1's and seg2's blocks:
    * fillers cannot chain to each other across snippets (dq < 0), and
      their dq to/from seg1/seg2 exceeds the normal max_dist_y, so the
      normal-band best chain is seg1 alone -> rescue fires;
    * > 2x64 filler slots separate seg1's last anchor from seg2's first,
      and no single filler is within 64 slots of both, so a 64-slot
      wide-band DP cannot bridge the gap while the full-window DP does;
    * anchor density stays ~0.18/bp, so no 64 consecutive slots span
      <= 200bp of target — the NORMAL band's truncation detector is
      provably silent, making the per-band flag the only safety net."""
    seg1 = genome[10000:10400]
    seg2 = genome[11900:12300]
    rng = np.random.default_rng(99)
    parts = []
    for i in range(50):
        gpos = 11740 - 24 * i
        parts.append(genome[gpos : gpos + 40])
        parts.append(bytes(rng.choice(list(b"ACGT"), size=15).astype(np.uint8)))
    return seg1 + b"".join(parts) + seg2


@pytest.fixture(scope="module")
def setup():
    genome = random_genome(60_000, seed=8)
    idx = build_index([("chrW", genome)], IndexParams(w=W, k=K))
    cp = ChainParams.defaults_for_k(
        K, max_dist_x=200, max_dist_y=200, bw=100, bw_long=3000,
        rmq_rescue_size=100,
    )
    mp = MapParams()
    return genome, idx, cp, mp


def test_wide_band_truncation_is_flagged(setup):
    genome, idx, cp, mp = setup
    mapper = Mapper.from_oracle_index(
        idx, cp, mp, buckets=(4096,), batch_size=8, lite_window_cap=64
    )
    assert mapper._lite_eligible()
    read = _engineered_read(genome)
    # sanity companions: ordinary reads through the same small window
    rl = [
        ("engineered", read),
        ("plain1", genome[3000:3900]),
        ("plain2", genome[20000:22000]),
    ]
    host = map_reads(idx, rl, cp, mp)
    dev = mapper.map_reads(rl)
    assert dev == host
    # the engineered read must actually exercise the rescue+wide path:
    # its oracle mapping spans both segments (q extent > 2000)
    eng = [l for l in host if l.startswith("engineered\t")]
    assert eng, "engineered read should map"
    f = eng[0].split("\t")
    assert int(f[3]) - int(f[2]) > 2000, "oracle chain should span the gap"


def test_small_window_cap_parity_random(setup):
    """Random reads under an aggressively small window cap must still be
    byte-identical (flagged reads re-run; unflagged ones are provably
    untruncated)."""
    genome, idx, cp, mp = setup
    from minimap2_rs_tpu.utils.seqsim import simulate_reads

    mapper = Mapper.from_oracle_index(
        idx, cp, mp, buckets=(1024, 4096), batch_size=8, lite_window_cap=64
    )
    reads = simulate_reads(genome, 8, read_len=(300, 2500), seed=31)
    rl = [(n, s) for n, s, *_ in reads]
    assert mapper.map_reads(rl) == map_reads(idx, rl, cp, mp)
