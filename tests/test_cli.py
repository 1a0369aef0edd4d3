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


def test_cli_surject_inject_roundtrip(indexed, capsys, tmp_path):
    """surject then inject recovers graph alignments at the same positions."""
    d, prefix = indexed
    mapped_gam = d / "mapped.gam"
    sam_f = tmp_path / "out.sam"
    import contextlib
    import io as _io

    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        assert main(["surject", "-Z", prefix, "-i", str(mapped_gam)]) == 0
    sam_f.write_text(buf.getvalue())
    inj_gam = tmp_path / "inj.gam"
    assert main(["inject", "-x", prefix + ".vgz.npz", str(sam_f),
                 "--output", str(inj_gam)]) == 0
    from vg_tpu.io.gam import read_gam

    orig = {a.name: a for a in read_gam(str(mapped_gam))}
    back = list(read_gam(str(inj_gam)))
    assert len(back) == len(orig)
    n_pos_match = 0
    for a in back:
        o = orig[a.name]
        if a.path and o.path and a.path.mappings and o.path.mappings:
            # surjection may shift an alignment by an indel or clip; accept
            # a start on the same or a neighboring node of the original
            onodes = {mp.position.node_id for mp in o.path.mappings}
            if a.path.mappings[0].position.node_id in onodes:
                n_pos_match += 1
            # read bases must be fully accounted either way
            assert sum(e.to_length for mp in a.path.mappings
                       for e in mp.edits) == len(a.sequence)
    assert n_pos_match >= 0.85 * len([a for a in back if a.path])


def test_cli_gamsort_filter_stats(indexed, capsys, tmp_path):
    d, prefix = indexed
    mapped_gam = d / "mapped.gam"
    sorted_gam = tmp_path / "sorted.gam"
    assert main(["gamsort", str(mapped_gam), "--output", str(sorted_gam)]) == 0
    from vg_tpu.io.gam import read_gam
    from vg_tpu.utils.alnstats import sort_key

    alns = list(read_gam(str(sorted_gam)))
    keys = [sort_key(a) for a in alns]
    assert keys == sorted(keys)

    filt = tmp_path / "filt.gam"
    assert main(["filter", str(mapped_gam), "-q", "50", "-U",
                 "--output", str(filt)]) == 0
    capsys.readouterr()
    kept = list(read_gam(str(filt)))
    assert all(a.mapping_quality >= 50 for a in kept)

    assert main(["stats", str(mapped_gam), "-a"]) == 0
    out = dict(l.split("\t") for l in capsys.readouterr().out.splitlines())
    assert int(out["total"]) == 50
    assert int(out["aligned"]) >= 45


def test_cli_gamsort_external(indexed, tmp_path):
    d, prefix = indexed
    mapped_gam = d / "mapped.gam"
    out = tmp_path / "ext.gam"
    assert main(["gamsort", str(mapped_gam), "-e", "--chunk-size", "10",
                 "--output", str(out)]) == 0
    from vg_tpu.io.gam import read_gam
    from vg_tpu.utils.alnstats import sort_key

    alns = list(read_gam(str(out)))
    keys = [sort_key(a) for a in alns]
    assert keys == sorted(keys)
    assert len(alns) == 50


def test_cli_haplotypes_sampling(indexed, tmp_path):
    d, prefix = indexed
    fq = d / "reads.fq"
    out_prefix = str(tmp_path / "sampled")
    assert main(["haplotypes", "-Z", prefix, "-f", str(fq),
                 "-n", "1", "-p", out_prefix]) == 0
    from vg_tpu.io import native

    g = native.load_graph(out_prefix + ".vgz.npz")
    haps = native.load_haplotypes(out_prefix + ".hpt.npz", g)
    assert haps.count <= 2


def test_cli_surject_bam(indexed, capsys, tmp_path):
    """surject --bam emits a BAM whose records match the SAM output."""
    d, prefix = indexed
    mapped_gam = d / "mapped.gam"
    import contextlib
    import io as _io

    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        assert main(["surject", "-Z", prefix, "-i", str(mapped_gam)]) == 0
    sam_lines = [l for l in buf.getvalue().splitlines()
                 if l and not l.startswith("@")]

    bam_f = tmp_path / "out.bam"
    assert main(["surject", "-Z", prefix, "-i", str(mapped_gam),
                 "-b", str(bam_f)]) == 0
    from vg_tpu.io.bam import read_bam
    header, refs, recs = read_bam(str(bam_f))
    assert ("x", 1001) in refs
    assert len(recs) == len(sam_lines)
    for line, rec in zip(sam_lines, recs):
        cols = line.split("\t")
        assert rec.qname == cols[0]
        assert rec.flag == int(cols[1])
        assert rec.rname == cols[2]
        assert rec.pos == int(cols[3])
        assert rec.cigar == cols[5]
        assert rec.seq == cols[9]


def test_cli_gamsort_index_find(indexed, capsys, tmp_path):
    """gamsort -i writes a .gai; find -l pulls alignments by node."""
    d, prefix = indexed
    mapped_gam = d / "mapped.gam"
    sorted_gam = tmp_path / "sorted.gam"
    gai = tmp_path / "sorted.gam.gai"
    assert main(["gamsort", str(mapped_gam), "--output", str(sorted_gam),
                 "-i", str(gai)]) == 0
    assert gai.exists()
    from vg_tpu.io.gam import read_gam

    alns = list(read_gam(str(sorted_gam)))
    assert len(alns) == 50
    # pick a node visited by some alignment and look it up
    node = alns[10].path.mappings[0].position.node_id
    out = tmp_path / "hits.gam"
    assert main(["find", "-n", str(node), "-l", str(sorted_gam),
                 "-o", str(out)]) == 0
    hits = list(read_gam(str(out)))
    assert hits
    expect = {a.name for a in alns if a.path and node in
              {mp.position.node_id for mp in a.path.mappings}}
    assert {a.name for a in hits} == expect


def test_cli_inject_from_bam(indexed, capsys, tmp_path):
    """surject -b then inject the BAM directly: full GAM roundtrip."""
    d, prefix = indexed
    mapped_gam = d / "mapped.gam"
    bam_f = tmp_path / "rt.bam"
    assert main(["surject", "-Z", prefix, "-i", str(mapped_gam),
                 "-b", str(bam_f)]) == 0
    inj_gam = tmp_path / "rt.gam"
    assert main(["inject", "-x", prefix + ".vgz.npz", str(bam_f),
                 "--output", str(inj_gam)]) == 0
    from vg_tpu.io.gam import read_gam

    orig = {a.name for a in read_gam(str(mapped_gam))}
    back = list(read_gam(str(inj_gam)))
    assert {a.name for a in back} == orig
    assert sum(1 for a in back if a.path and a.path.mappings) >= \
        0.9 * len(back)


def test_cli_viz_svg(indexed, capsys):
    """Linear SVG viz (vg viz role): well-formed XML with a node ribbon,
    path rows, and a read pileup track."""
    import xml.dom.minidom as minidom

    d, prefix = indexed
    gam = str(d / "viz_reads.gam")
    rc = main(["sim", "-Z", prefix, "-n", "20", "-l", "80", "-a",
               "-s", "5", "--output", gam])
    assert rc == 0
    svg_path = str(d / "x.svg")
    rc = main(["viz", "-x", prefix + ".vgz.npz", "-f", "svg",
               "-d", gam, "-o", svg_path])
    assert rc == 0
    doc = minidom.parse(svg_path)
    rects = doc.getElementsByTagName("rect")
    assert len(rects) > 50          # ribbon + paths + pileup
    assert doc.documentElement.tagName == "svg"


def test_cli_view_turtle(indexed, capsys):
    """RDF/Turtle export uses the vg ontology and references only
    declared nodes."""
    import re

    d, prefix = indexed
    rc = main(["view", "-t", prefix + ".vgz.npz"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "@prefix vg:<http://biohackathon.org/resource/vg#>" in out
    nodes = set(re.findall(r"node:(\d+) rdf:value", out))
    refs = set(re.findall(r"node:(\d+)", out))
    assert nodes and refs == nodes
    assert "vg:Step" in out and "vg:linksForwardToForward" in out


def test_cli_giraffe_sweep(indexed, tmp_path):
    """Parameter grid sweeps (rangeable options role): one mapping run
    per grid point, outputs suffixed with the combination."""
    d, prefix = indexed
    fq = d / "reads.fq"
    out = tmp_path / "sw.gam"
    rc = main(["giraffe", "-Z", prefix, "-f", str(fq),
               "--sweep", "hit_cap=10:20:10", "--output", str(out)])
    assert rc == 0
    from vg_tpu.io.gam import read_gam

    for tag in ("hit_cap-10", "hit_cap-20"):
        f = tmp_path / f"sw.{tag}.gam"
        assert f.exists(), tag
        assert len(list(read_gam(str(f)))) == 50


def test_cli_augment_translate_roundtrip(indexed, tmp_path):
    """augment -Z + translate: alignments projected onto the augmented
    graph stay base-accounted and edge-valid."""
    d, prefix = indexed
    mapped_gam = d / "mapped.gam"
    aug = tmp_path / "aug.npz"
    trans = tmp_path / "trans.json"
    assert main(["augment", prefix + ".vgz.npz", str(mapped_gam),
                 "-o", str(aug), "-Z", str(trans)]) == 0
    out = tmp_path / "translated.gam"
    assert main(["translate", str(trans), str(mapped_gam),
                 "-x", str(aug), "--output", str(out)]) == 0
    from vg_tpu.io.gam import read_gam
    from vg_tpu.io.native import load_graph

    g2 = load_graph(str(aug))
    n = 0
    for a in read_gam(str(out)):
        if a.path is None or not a.path.mappings:
            continue
        n += 1
        tl = sum(e.to_length for mp in a.path.mappings for e in mp.edits)
        assert tl == len(a.sequence), a.name
        for mp in a.path.mappings:
            fl = sum(e.from_length for e in mp.edits)
            assert (mp.position.offset + fl
                    <= g2.node_len(mp.position.node_id)), a.name
        hs = [g2.handle(m.position.node_id, m.position.is_reverse)
              for m in a.path.mappings]
        for h1, h2 in zip(hs[:-1], hs[1:]):
            assert h1 == h2 or g2.has_edge(h1, h2), a.name
    assert n >= 40


def test_cli_genotype(indexed, capsys):
    """Legacy genotype (augment -> translate -> pack -> call) emits
    variant calls from haplotype-bearing reads."""
    d, prefix = indexed
    mapped_gam = d / "mapped.gam"
    rc = main(["genotype", prefix + ".vgz.npz", str(mapped_gam)])
    assert rc == 0
    out = capsys.readouterr().out
    body = [l for l in out.splitlines() if l and not l.startswith("#")]
    assert len(body) >= 10
    assert out.startswith("##fileformat")


def test_cli_concat(indexed, tmp_path, capsys):
    d, prefix = indexed
    g = prefix + ".vgz.npz"
    out = tmp_path / "cat.npz"
    assert main(["concat", g, g, "-o", str(out)]) == 0
    from vg_tpu.io.native import load_graph

    g1 = load_graph(g)
    g2 = load_graph(str(out))
    # reference goldens (09_vg_concat.t): nodes double, edges double + 1
    assert g2.node_count == 2 * g1.node_count
    assert g2.edge_count == 2 * g1.edge_count + 1
    assert not g2.validate()
    # the concatenated reference path doubles in length
    pi = g2.path_index("x")
    n1 = len(g1.path_handles(g1.path_index("x")))
    assert len(g2.path_handles(pi)) == 2 * n1


def test_cli_gbwt_kmers_minimizer(indexed, tmp_path, capsys):
    d, prefix = indexed
    assert main(["gbwt", "-Z", prefix]) == 0
    out = capsys.readouterr().out
    assert "threads\t3" in out
    assert main(["kmers", "-Z", prefix, "-k", "11", "--head", "5"]) == 0
    lines = capsys.readouterr().out.splitlines()
    assert len(lines) == 5 and all("\t" in l for l in lines)
    assert main(["minimizer", "-Z", prefix, "-k", "21", "-w", "9",
                 "-o", str(tmp_path / "m.npz")]) == 0
    out = capsys.readouterr().out
    assert "k\t21" in out


def test_cli_chains_dotplot(indexed, capsys):
    d, prefix = indexed
    g = prefix + ".vgz.npz"
    assert main(["chains", g]) == 0
    out = capsys.readouterr().out
    assert out.startswith("chain0\t") and ".." in out
    assert main(["dotplot", "-x", g, "--max-points", "50"]) == 0
    lines = capsys.readouterr().out.splitlines()
    assert lines[0].startswith("#x\ty")
    assert len(lines) > 10
    # self-dotplot has the identity diagonal
    assert any(l.split("\t")[0] == l.split("\t")[1] for l in lines[1:])


def test_cli_full_length_bonus_golden(indexed, capsys, ref_test_dir):
    """50_vg_giraffe.t goldens: score 73 with the full-length bonus,
    63 with --full-l-bonus 0."""
    d, prefix = indexed
    fq = str(ref_test_dir / "reads" / "small.middle.ref.fq")
    assert main(["giraffe", "-Z", prefix, "-f", fq, "-o", "json"]) == 0
    assert json.loads(capsys.readouterr().out.splitlines()[0])["score"] == 73
    assert main(["giraffe", "-Z", prefix, "-f", fq, "--full-l-bonus", "0",
                 "-o", "json"]) == 0
    assert json.loads(capsys.readouterr().out.splitlines()[0])["score"] == 63


def test_cli_comments_as_tags(indexed, capsys, tmp_path):
    """50_vg_giraffe.t role: FASTQ header comments ride into GAF columns,
    SAM tags, and GAM annotation."""
    d, prefix = indexed
    fq = tmp_path / "tagged.fq"
    seq = "CAAATAAGGCTTGGAAATTTTCTGGAGTTCTATTATATTCCAACTCTCTG"
    fq.write_text(f"@read1\tT1:A:t T2:i:1\n{seq}\n+\n{'H' * len(seq)}\n")
    assert main(["giraffe", "-Z", prefix, "-f", str(fq),
                 "--comments-as-tags", "-o", "gaf"]) == 0
    line = capsys.readouterr().out.splitlines()[0]
    assert "T1:A:t" in line and "T2:i:1" in line
    assert main(["giraffe", "-Z", prefix, "-f", str(fq),
                 "--comments-as-tags", "-o", "sam"]) == 0
    sam = [l for l in capsys.readouterr().out.splitlines()
           if l and not l.startswith("@")][0]
    assert "T1:A:t" in sam and "T2:i:1" in sam
    gam = tmp_path / "tagged.gam"
    assert main(["giraffe", "-Z", prefix, "-f", str(fq),
                 "--comments-as-tags", "--output", str(gam)]) == 0
    from vg_tpu.io.gam import read_gam

    a = next(iter(read_gam(str(gam))))
    assert a.annotation.get("tags") == "T1:A:t T2:i:1"
