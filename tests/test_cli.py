"""CLI surface tests: the toolkit loop sim -> map -> compare -> pack ->
call driven through vg_tpu.cli.main (in-process)."""
import json

import pytest

from vg_tpu.cli.main import main


@pytest.fixture(scope="module")
def indexed(tmp_path_factory, ref_test_dir):
    d = tmp_path_factory.mktemp("cli")
    prefix = str(d / "x")
    rc = main(["autoindex",
               "-r", str(ref_test_dir / "small" / "x.fa"),
               "-v", str(ref_test_dir / "small" / "x.vcf.gz"),
               "-p", prefix])
    assert rc == 0
    return d, prefix


def test_cli_sim_map_compare(indexed, capsys):
    d, prefix = indexed

    # sim with truth
    truth_gam = d / "truth.gam"
    rc = main(["sim", "-Z", prefix, "-n", "50", "-l", "100",
               "-e", "0.01", "-s", "7", "-a", "--output", str(truth_gam)])
    assert rc == 0
    from vg_tpu.io.gam import read_gam

    truth = list(read_gam(str(truth_gam)))
    assert len(truth) == 50
    fq = d / "reads.fq"
    with open(fq, "w") as f:
        for a in truth:
            f.write(f"@{a.name}\n{a.sequence}\n+\n{'I' * len(a.sequence)}\n")

    mapped_gam = d / "mapped.gam"
    rc = main(["giraffe", "-Z", prefix, "-f", str(fq),
               "--output", str(mapped_gam)])
    assert rc == 0

    rc = main(["gamcompare", str(mapped_gam), str(truth_gam)])
    assert rc == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["total"] == 50
    assert stats["accuracy"] >= 0.9

    # pack + call
    pack_f = d / "cov.pack.npz"
    rc = main(["pack", "-Z", prefix, "-g", str(mapped_gam),
               "-o", str(pack_f)])
    assert rc == 0
    rc = main(["call", "-Z", prefix, "-k", str(pack_f), "-s", "1"])
    assert rc == 0
    vcf_out = capsys.readouterr().out
    body = [l for l in vcf_out.splitlines() if l and not l.startswith("#")]
    assert len(body) >= 20                    # het/hom calls from 3-hap mix
    assert vcf_out.startswith("##fileformat=VCFv4.2")


def test_cli_stats_paths_validate(indexed, capsys):
    d, prefix = indexed
    g = prefix + ".vgz.npz"
    assert main(["stats", g]) == 0
    out = dict(l.split("\t") for l in capsys.readouterr().out.splitlines())
    assert out["nodes"] == "215" and out["edges"] == "296"
    assert main(["paths", "-x", g]) == 0
    assert capsys.readouterr().out.strip() == "x"
    assert main(["validate", "-x", g]) == 0


def test_cli_view_gfa_roundtrip(indexed, capsys):
    d, prefix = indexed
    g = prefix + ".vgz.npz"
    assert main(["view", g, "-g"]) == 0
    gfa_text = capsys.readouterr().out
    assert gfa_text.startswith("H\t")
    from vg_tpu.io.gfa import parse_gfa
    from vg_tpu.io.native import load_graph

    g2 = parse_gfa(gfa_text)
    g1 = load_graph(g)
    assert dict(g1.iter_nodes()) == dict(g2.iter_nodes())
    assert set(g1.iter_edges()) == set(g2.iter_edges())
