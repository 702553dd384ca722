"""CLI tests mirroring the reference's subcommands (main.rs:18-90)."""

import numpy as np
import pytest

from minimap2_rs_tpu.cli import main
from minimap2_rs_tpu.io.fasta import read_fasta, write_fasta
from minimap2_rs_tpu.utils.seqsim import random_genome, simulate_reads


@pytest.fixture(scope="module")
def fixtures(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli")
    genome = random_genome(80_000, seed=9)
    ref = str(d / "ref.fa")
    write_fasta(ref, [("chrT", genome)])
    reads = simulate_reads(genome, 5, read_len=(400, 800), seed=10)
    qry = str(d / "reads.fa")
    write_fasta(qry, [(n, s) for n, s, *_ in reads])
    return d, ref, qry, genome, reads


def test_fasta_roundtrip(fixtures):
    d, ref, qry, genome, _ = fixtures
    recs = read_fasta(ref)
    assert recs == [("chrT", genome)]


def test_cli_index_and_align_mmi(fixtures, capsys):
    d, ref, qry, genome, reads = fixtures
    mmi = str(d / "ref.mmi")
    assert main(["index", ref, "-d", mmi]) == 0
    out = capsys.readouterr().out
    assert "distinct minimizers:" in out and "kmer size: 15" in out
    assert main(["align", mmi, qry, "--engine", "host"]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) >= len(reads) - 1
    truth = {n: (st, en, s) for n, _q, st, en, s in reads}
    for line in out:
        f = line.split("\t")
        assert f[5] == "chrT"
        st, en, strand = truth[f[0]]
        assert f[4] == strand
        assert abs(int(f[7]) - st) < 150


def test_cli_align_from_fasta_first_only(fixtures, capsys):
    d, ref, qry, genome, reads = fixtures
    assert main(["align", ref, qry, "--first-only", "--engine", "host"]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1 and out[0].split("\t")[0] == "read0"


def test_cli_anchors_and_chain(fixtures, capsys):
    d, ref, qry, genome, reads = fixtures
    assert main(["anchors", ref, qry]) == 0
    out = capsys.readouterr().out
    assert out.startswith("anchors: ")
    assert main(["chain", ref, qry]) == 0
    out = capsys.readouterr().out
    assert "best_chain_len:" in out


def test_cli_output_file(fixtures, tmp_path):
    d, ref, qry, genome, reads = fixtures
    outp = str(tmp_path / "out.paf")
    assert main(["align", ref, qry, "-o", outp, "--engine", "host"]) == 0
    lines = open(outp).read().strip().splitlines()
    assert lines and all(len(l.split("\t")) == 18 for l in lines)


def test_cli_anchors_chain_device_matches_host(fixtures, capsys):
    """--engine device on the debug subcommands must print exactly what
    the host oracle prints (the device chain uses the pruned kernel)."""
    d, ref, qry, genome, reads = fixtures
    outs = {}
    for eng in ("host", "device"):
        assert main(["anchors", ref, qry, "--engine", eng]) == 0
        a = capsys.readouterr().out
        assert main(["chain", ref, qry, "--engine", eng]) == 0
        c = capsys.readouterr().out
        outs[eng] = (a, c)
    assert outs["device"] == outs["host"]
    assert outs["host"][0].startswith("anchors: ")
    assert "best_chain_len: " in outs["host"][1]


def test_cli_anchors_chain_device_even_k(fixtures, capsys, monkeypatch):
    """Even k must use the device engine on the debug subcommands too
    (the exact even-k scan landed in ops/sketch_scan.py; the old CLI
    guard silently downgraded -k 14 to host) and match the host oracle."""
    import minimap2_rs_tpu.cli as cli_mod

    d, ref, qry, genome, reads = fixtures
    taken = []
    orig = cli_mod._device_anchors

    def spy(idx, q, mid_occ):
        out = orig(idx, q, mid_occ)
        taken.append(out is not None)
        return out

    monkeypatch.setattr(cli_mod, "_device_anchors", spy)
    outs = {}
    for eng in ("host", "device"):
        assert main(["anchors", ref, qry, "-k", "14", "--engine", eng]) == 0
        a = capsys.readouterr().out
        assert main(["chain", ref, qry, "-k", "14", "--engine", eng]) == 0
        c = capsys.readouterr().out
        outs[eng] = (a, c)
    assert outs["device"] == outs["host"]
    assert taken and all(taken), "device path not taken at k=14"


def test_cli_align_mesh(fixtures, capsys):
    """--mesh DP maps over a device mesh (replicated index) and
    --index-shards IX shards it; output must equal the host engine."""
    d, ref, qry, genome, reads = fixtures
    assert main(["align", ref, qry, "--engine", "host"]) == 0
    host = capsys.readouterr().out
    assert main(["align", ref, qry, "--engine", "device", "--mesh", "2"]) == 0
    assert capsys.readouterr().out == host
    assert main([
        "align", ref, qry, "--engine", "device",
        "--mesh", "2", "--index-shards", "2",
    ]) == 0
    assert capsys.readouterr().out == host
