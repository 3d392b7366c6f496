"""Simulation harness tests: generators, truth, evaluation parity, and
the self-contained conformance loop (simulate → scaffold → evaluate)."""

import random
import re

import numpy as np
import pytest

from haphic_tpu.sim.evaluate import (evaluate_scaffolds, generate_truth,
                                     parse_truth, write_truth)
from haphic_tpu.sim.generators import (decode_truth_id, mock_gfa,
                                       sim_chimeric_contigs, sim_contigs,
                                       sim_haplotypes, sim_hic_pairs)

from . import refbridge
from . import util


def _template(seed=0, nchr=2, chr_len=300000):
    rng = random.Random(seed)
    return {'Chr{:02d}'.format(i + 1):
            ''.join(rng.choice('ATCG') for _ in range(chr_len))
            for i in range(nchr)}


def test_sim_contigs_truth_encoding():
    seqs = _template()
    ctgs = sim_contigs(seqs, mean=40000, cv=0.3, seed=2)
    total = sum(len(s) for s in ctgs.values())
    assert total == sum(len(s) for s in seqs.values())
    for cid, seq in ctgs.items():
        chrom, start, end, ori = decode_truth_id(cid)
        assert chrom in seqs
        expected = seqs[chrom][start - 1:end]
        if ori == '-':
            from haphic_tpu.io.fasta import revcomp
            expected = revcomp(expected)
        assert seq == expected


def test_sim_haplotypes_divergence():
    seqs = _template(nchr=1, chr_len=100000)
    haps, allele_info = sim_haplotypes(seqs, ploidy=2, div=0.01, seed=3)
    assert len(haps) == 2
    h1 = haps[0]['Chr01_1']
    # ~1% divergence (indels shift length slightly)
    assert abs(len(h1) - 100000) < 2000
    diffs = sum(1 for a, b in zip(h1, seqs['Chr01']) if a != b)
    assert diffs > 100
    assert allele_info


def test_sim_chimeras():
    seqs = _template(nchr=1)
    ctgs = sim_contigs(seqs, mean=50000, cv=0.2, seed=4)
    n0 = len(ctgs)
    out = sim_chimeric_contigs(ctgs, 2, seed=5)
    assert sum(1 for c in out if c.endswith('_chimeric')) == 2
    # each chimera consumes 2 contigs, yields 3 (chimera + 2 rests)
    assert len(out) == n0 + 2


def test_generate_truth_roundtrip(tmp_path):
    seqs = _template()
    ctgs = sim_contigs(seqs, mean=40000, cv=0.3, seed=6)
    truth = generate_truth(list(ctgs), chr_pattern=r'Chr\d+')
    assert set(truth) == set(seqs)
    for chrom, lst in truth.items():
        orders = [int(c.rsplit('_', 5)[1]) for c, _ in lst]
        assert orders == sorted(orders)
    p = tmp_path / 'truth.txt'
    write_truth(truth, str(p))
    assert parse_truth(str(p)) == truth


def _perfect_agp(tmp_path, truth, lengths):
    """AGP exactly matching the truth (everything syntenic)."""
    path = tmp_path / 'perfect.agp'
    with open(path, 'w') as f:
        for chrom, lst in truth.items():
            if chrom == 'unanchored':
                for c, o in lst:
                    f.write('{0}\t1\t{1}\t1\tW\t{0}\t1\t{1}\t+\n'
                            .format(c, lengths[c]))
                continue
            acc = 0
            for n, (c, o) in enumerate(lst, 1):
                f.write('{}\t{}\t{}\t{}\tW\t{}\t1\t{}\t{}\n'.format(
                    chrom, acc + 1, acc + lengths[c], n, c,
                    lengths[c], o))
                acc += lengths[c]
    return str(path)


def test_evaluate_perfect_scaffolds(tmp_path):
    seqs = _template()
    ctgs = sim_contigs(seqs, mean=40000, cv=0.3, seed=7)
    truth = generate_truth(list(ctgs))
    lengths = {c: len(s) for c, s in ctgs.items()}
    agp = _perfect_agp(tmp_path, truth, lengths)
    res = evaluate_scaffolds(truth, agp)
    assert res.counts['syntenic'] == len(ctgs)
    assert res.pct('syntenic') == pytest.approx(100.0)


def test_evaluate_parity_with_reference(tmp_path, capsys):
    """Same truth+AGP through the reference evaluator — identical
    class counts/lengths (parsed from its printed summary)."""
    rng = random.Random(8)
    seqs = _template(seed=8)
    ctgs = sim_contigs(seqs, mean=30000, cv=0.3, seed=8)
    truth = generate_truth(list(ctgs))
    lengths = {c: len(s) for c, s in ctgs.items()}
    # scramble: swap two contigs across chroms (translocations), flip
    # one orientation (inversion), shuffle one local order (relocation)
    scaf: dict = {c: list(lst) for c, lst in truth.items()}
    chroms = [c for c in scaf if c != 'unanchored']
    a, b = chroms[0], chroms[1]
    scaf[a][2], scaf[b][3] = scaf[b][3], scaf[a][2]
    c0, o0 = scaf[a][0]
    scaf[a][0] = (c0, '-' if o0 == '+' else '+')
    scaf[b][1], scaf[b][4] = scaf[b][4], scaf[b][1]
    agp = _perfect_agp(tmp_path, scaf, lengths)

    res = evaluate_scaffolds(truth, agp)

    tpath = tmp_path / 'truth.txt'
    write_truth(truth, str(tpath))
    ref = refbridge.load('evaluate_scaffolds')
    truth_dict, ctg_info_dict = ref.parse_truth(str(tpath))
    scaffold_dict, scaffold_nctgs_dict = ref.parse_agp(agp,
                                                       ctg_info_dict)
    capsys.readouterr()
    ref.evaluate(scaffold_dict, scaffold_nctgs_dict, truth_dict,
                 ctg_info_dict)
    out = capsys.readouterr().out
    for key, label in [('syntenic', 'Syntenic'),
                       ('unanchored', 'Unanchored'),
                       ('newly_anchored', 'Newly_anchored'),
                       ('translocation', 'Translocation'),
                       ('relocation', 'Relocation'),
                       ('inversion', 'Inversion contigs'),
                       ('inversion_and_relocation',
                        'Inversion and relocation')]:
        pat = r'{}.*?:\n (\d+) / (\d+) bp'.format(re.escape(label))
        m = re.search(pat, out)
        assert m, label
        assert res.counts[key] == int(m.group(1)), key
        assert res.lengths[key] == int(m.group(2)), key


def test_mock_gfa(tmp_path):
    ctgs = {'a': 'ACGT' * 10, 'b': 'GGCC' * 5}
    p = tmp_path / 'm.gfa'
    mock_gfa(ctgs, str(p), depth=25)
    lines = p.read_text().splitlines()
    assert lines[0].split('\t')[0] == 'S'
    assert 'LN:i:40' in lines[0] and 'rd:i:25' in lines[0]


def test_sim_hic_pairs_decay():
    seqs = _template(seed=9)
    ctgs = sim_contigs(seqs, mean=40000, cv=0.3, seed=9)
    recs = sim_hic_pairs(ctgs, 2000, seed=9)
    assert len(recs) == 2000
    # most pairs connect contigs of the same chromosome
    same = 0
    for _, c1, p1, c2, p2 in recs:
        if decode_truth_id(c1)[0] == decode_truth_id(c2)[0]:
            same += 1
    assert same / len(recs) > 0.8
