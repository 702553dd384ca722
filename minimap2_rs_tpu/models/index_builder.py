"""Index construction orchestration.

Three engines, one output (the flat sorted-array OracleIndex, which also
serializes to .mmi / native formats):

- device: chunked TPU sketch + global sort (ops/index_build.py) — the
  production path for big genomes;
- host: vectorized NumPy sketch (oracle/sketch.py fast path);
- native/exact: the C++ scan (runtime) or pure-Python scan — the
  reference-semantics fallback (also used for even k, where the
  vectorized characterization has documented tie corners).
"""

from __future__ import annotations

import numpy as np

from ..config import IndexParams
from ..oracle.index import OracleIndex, SeqMeta, _flatten, build_index
from ..utils.packing import nt4_encode, seq4_pack


def build_index_native(
    records: list[tuple[str | None, bytes]],
    params: IndexParams = IndexParams(),
    n_threads: int | None = None,
) -> OracleIndex:
    """Threaded C++ exact-scan build (mm2t_build_pairs — the reference's
    rayon region as std::thread). Falls back to the host build when the
    native library is absent. Fastest engine on this 2-core host: the
    device build's result transfer is bounded by the TPU relay's
    ~24 MB/s, while this path never leaves the host."""
    from ..runtime.host import native_build_index

    raw = b"".join(bytes(s) for _n, s in records)
    seq_off = np.zeros(len(records) + 1, dtype=np.int64)
    np.cumsum([len(s) for _n, s in records], out=seq_off[1:])
    out = native_build_index(
        raw, seq_off, params.w, params.k, params.is_hpc, is_ascii=True,
        n_threads=n_threads,
    )
    if out is None:
        return build_index(records, params)
    fkeys, starts, counts, positions, S = out
    seqs: list[SeqMeta] = []
    off = 0
    for name, s in records:
        seqs.append(SeqMeta(name=name, offset=off, length=len(s)))
        off += len(s)
    return OracleIndex(
        w=params.w, k=params.k, b=params.bucket_bits, flag=params.flag,
        n_seq=len(records), seq=seqs, S=S,
        keys=fkeys, starts=starts, counts=counts, positions=positions,
    )


def build_index_device(
    records: list[tuple[str | None, bytes]],
    params: IndexParams = IndexParams(),
    chunk: int = 1 << 18,
    batch_rows: int = 16,
) -> OracleIndex:
    """Build the index with device-side sketching (odd k only; even k
    falls back to the host path)."""
    if params.k % 2 == 0:
        return build_index(records, params, use_fast_sketch=False)
    from ..ops.index_build import build_sorted_pairs_device

    recs = [(rid, nt4_encode(s)) for rid, (_n, s) in enumerate(records)]
    keys, rps = build_sorted_pairs_device(
        recs, params.w, params.k, params.is_hpc, chunk=chunk, batch_rows=batch_rows
    )
    seqs: list[SeqMeta] = []
    off = 0
    for name, s in records:
        seqs.append(SeqMeta(name=name, offset=off, length=len(s)))
        off += len(s)
    codes = np.concatenate([c for _, c in recs]) if recs else np.zeros(0, np.uint8)
    S = seq4_pack(codes)
    fkeys, starts, counts, positions = _flatten(keys, rps, presorted=True)
    return OracleIndex(
        w=params.w, k=params.k, b=params.bucket_bits, flag=params.flag,
        n_seq=len(records), seq=seqs, S=S,
        keys=fkeys, starts=starts, counts=counts, positions=positions,
    )
