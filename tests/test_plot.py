"""Plot subsystem tests: KR parity, AGP bin-mapping parity, end-to-end."""

import random

import numpy as np
import pytest

from haphic_tpu.post import plot

from . import refbridge
from . import util


def _random_contact(seed, n=40):
    rng = np.random.default_rng(seed)
    m = rng.integers(1, 50, size=(n, n)).astype(np.float64)
    m = m + m.T
    return m


@pytest.mark.parametrize('seed', [0, 1])
def test_kr_parity(seed):
    ref = refbridge.load('HapHiC_plot')
    m = _random_contact(seed)
    x_ref, _ = ref.bnewt(m)
    x_got = plot.kr_balance(m)
    np.testing.assert_allclose(x_got, x_ref, rtol=1e-6)
    # doubly-stochastic check
    balanced = m * np.outer(x_got, x_got)
    np.testing.assert_allclose(balanced.sum(axis=0), 1.0, atol=1e-2)


def _write_agp(path, rows):
    with open(path, 'w') as f:
        for r in rows:
            f.write('\t'.join(str(x) for x in r) + '\n')


def test_bin_mapping_parity(tmp_path):
    """Our searchsorted mapping == reference interval-tree mapping."""
    ref = refbridge.load('HapHiC_plot')
    rng = random.Random(0)
    # 2 groups from 3 contigs with mixed orientations + an unanchored ctg
    rows = [
        ('g1', 1, 120000, 1, 'W', 'c1', 1, 120000, '+'),
        ('g1', 120101, 200000, 3, 'W', 'c2', 1, 79900, '-'),
        ('g2', 1, 90000, 1, 'W', 'c3', 10001, 100000, '+'),
        ('c4', 1, 50000, 1, 'W', 'c4', 1, 50000, '+'),
    ]
    # gap line should be ignored
    rows.insert(1, ('g1', 120001, 120100, 2, 'U', 100, 'scaffold', 'yes',
                    'proximity_ligation'))
    agp_path = tmp_path / 't.agp'
    _write_agp(str(agp_path), rows)

    bin_size = 10000
    agp = plot.parse_agp(str(agp_path))
    bi = plot.build_bins(agp, bin_size)

    ctg_dict, ctg_aln_dict, group_size_dict, frag_set, group_frag_dict = \
        ref.parse_agp(str(agp_path), bin_size)
    _, group_to_total_bin_dict, group_list, ctg_set = \
        ref.generate_contact_matrix(group_size_dict, frag_set,
                                    group_frag_dict, bin_size, 0, None)

    def ref_bin(ctg, pos):
        for rng_ in ctg_aln_dict[ctg].get((pos - 1) // bin_size, []):
            if pos in rng_:
                gb = ctg_dict[ctg][rng_]
                if gb[0] not in group_list:
                    return None
                return group_to_total_bin_dict[gb]
        return None

    lens = {'c1': 120000, 'c2': 79900, 'c3': 110000, 'c4': 50000}
    ctgs, poss = [], []
    for name, L in lens.items():
        for _ in range(300):
            ctgs.append(agp.ctg_id[name])
            poss.append(rng.randrange(1, L + 1))
    got = plot.map_to_bins(bi, np.asarray(ctgs), np.asarray(poss))
    for t in range(len(ctgs)):
        name = agp.ctg_names[ctgs[t]]
        expected = ref_bin(name, poss[t])
        g = int(got[t])
        assert (None if g < 0 else g) == expected, (name, poss[t])


def test_run_plot_end_to_end(tmp_path):
    rng = random.Random(2)
    ctgs, recs, chrom_of = util.clustered_genome_and_pairs(
        rng, nchrs=2, ctgs_per_chr=3, ctg_len=6000, n_pairs=4000)
    pairs = tmp_path / 'hic.pairs'
    util.write_pairs(str(pairs), recs)
    # simple AGP: one group per chromosome, contigs concatenated
    rows = []
    for c in range(2):
        pos = 0
        for i in range(3):
            name = 'chr{}_ctg{}'.format(c + 1, i + 1)
            L = len(ctgs[name])
            rows.append(('chr{}'.format(c + 1), pos + 1, pos + L,
                         2 * i + 1, 'W', name, 1, L, '+'))
            pos += L
    agp = tmp_path / 's.agp'
    _write_agp(str(agp), rows)

    out = plot.run_plot(str(agp), str(pairs), outdir=str(tmp_path),
                        bin_size_kbp=2, normalization='KR')
    assert out.endswith('contact_map.pdf')
    import os
    assert os.path.getsize(out) > 0
    # cache reuse path
    out2 = plot.run_plot(str(agp), str(tmp_path / 'contact_matrix.pkl'),
                         outdir=str(tmp_path), bin_size_kbp=2,
                         normalization='log10', out_name='log.pdf')
    assert os.path.getsize(out2) > 0
    # cache with wrong params errors
    with pytest.raises(RuntimeError):
        plot.run_plot(str(agp), str(tmp_path / 'contact_matrix.pkl'),
                      outdir=str(tmp_path), bin_size_kbp=4)


def test_symmetrize():
    m = np.array([[2, 3], [1, 4]])
    s = plot.symmetrize(m)
    assert s.tolist() == [[2, 4], [4, 4]]
