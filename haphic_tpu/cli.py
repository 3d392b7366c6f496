"""Command-line interface.

Mirrors the reference `haphic` dispatcher
(reference: haphic:85-117 — subcommands pipeline/cluster/reassign/
sort/build/plot/refsort/check) but runs in-process instead of
subprocess-execing per-stage scripts, and returns structured results.
"""

from __future__ import annotations

import argparse
import logging
import sys

from haphic_tpu._version import __version__, __update_time__


def _add_cluster_args(p: argparse.ArgumentParser) -> None:
    g = p.add_argument_group('clustering')
    g.add_argument('--RE', default='GATC',
                   help='restriction enzyme site(s), comma separated')
    g.add_argument('--bin_size', type=int, default=-1,
                   help='bin size (kbp); -1 auto, 0 disables binning')
    g.add_argument('--flank', type=int, default=500, help='flank size (kbp)')
    g.add_argument('--Nx', type=int, default=80)
    g.add_argument('--RE_site_cutoff', type=int, default=25)
    g.add_argument('--density_lower', default='0.2X')
    g.add_argument('--density_upper', default='1.9X')
    g.add_argument('--topN', type=int, default=10)
    g.add_argument('--rank_sum_upper', default='1.5X')
    g.add_argument('--rank_sum_hard_cutoff', type=int, default=0)
    g.add_argument('--read_depth_upper', default='1.5X')
    g.add_argument('--remove_allelic_links', type=int, default=0,
                   help='ploidy; 0 disables allelic link removal')
    g.add_argument('--remove_concentrated_links', action='store_true')
    g.add_argument('--concordance_ratio_cutoff', type=float, default=0.2)
    g.add_argument('--nwindows', type=int, default=50)
    g.add_argument('--max_read_pairs', type=int, default=200)
    g.add_argument('--min_read_pairs', type=int, default=20)
    g.add_argument('--phasing_weight', type=float, default=1.0)
    g.add_argument('--normalize_by_nlinks', action='store_true')
    g.add_argument('--min_inflation', type=float, default=1.1)
    g.add_argument('--max_inflation', type=float, default=3.0)
    g.add_argument('--inflation_step', type=float, default=0.1)
    g.add_argument('--max_iter', type=int, default=200)
    g.add_argument('--pruning', type=float, default=1e-4)
    g.add_argument('--whitelist', default=None)
    g.add_argument('--gfa', default=None)
    g.add_argument('--quick_view', action='store_true')
    g.add_argument('--correct_nrounds', type=int, default=0)
    g.add_argument('--correct_resolution', type=int, default=500)
    g.add_argument('--median_cov_ratio', type=float, default=0.2)
    g.add_argument('--region_len_ratio', type=float, default=0.1)
    g.add_argument('--min_region_cutoff', type=int, default=5000)
    g.add_argument('--ul', default=None,
                   help='ultra-long read alignments (BAM)')
    g.add_argument('--min_ul_mapq', type=int, default=30)
    g.add_argument('--min_ul_alignment_length', type=int, default=10000)
    g.add_argument('--max_distance_to_end', type=int, default=100)
    g.add_argument('--max_overlap_ratio', type=float, default=0.5)
    g.add_argument('--max_gap_len', type=int, default=10000)
    g.add_argument('--min_ul_support', type=int, default=2)


def _add_reassign_args(p: argparse.ArgumentParser) -> None:
    g = p.add_argument_group('reassignment')
    g.add_argument('--min_group_len', type=float, default=5)
    g.add_argument('--max_ctg_len', type=float, default=10000)
    g.add_argument('--min_RE_sites', type=int, default=25)
    g.add_argument('--min_links', type=int, default=25)
    g.add_argument('--min_link_density', type=float, default=0.0001)
    g.add_argument('--min_density_ratio', type=float, default=4)
    g.add_argument('--ambiguous_cutoff', type=float, default=0.6)
    g.add_argument('--reassign_nrounds', type=int, default=5)
    g.add_argument('--nclusters', type=int, default=0)
    g.add_argument('--no_additional_rescue', action='store_true')


def _add_sort_args(p: argparse.ArgumentParser) -> None:
    g = p.add_argument_group('ordering and orientation')
    g.add_argument('--skip_fast_sort', action='store_true')
    g.add_argument('--skip_allhic', action='store_true',
                   help='skip GA tour optimization')
    g.add_argument('--skipGA', action='store_true')
    g.add_argument('--mutprob', type=float, default=0.2)
    g.add_argument('--ngen', type=int, default=5000)
    g.add_argument('--npop', type=int, default=100)
    g.add_argument('--seed', type=int, default=42)
    g.add_argument('--flanking_region', type=int, default=0)
    g.add_argument('--density_cal_method', default='multiplication',
                   choices=['multiplication', 'sum', 'geometric_mean'])
    g.add_argument('--confidence_cutoff', type=float, default=1.0)


def _add_build_args(p: argparse.ArgumentParser) -> None:
    g = p.add_argument_group('scaffold building')
    g.add_argument('--Ns', type=int, default=100)
    g.add_argument('--max_width', type=int, default=60)
    g.add_argument('--sort_by_input', action='store_true')
    g.add_argument('--prefix', default='scaffolds')


def _config_from_args(args) -> 'PipelineConfig':
    from haphic_tpu.assign.reassign import ReassignParams
    from haphic_tpu.pipeline import PipelineConfig
    cfg = PipelineConfig()
    for name in vars(cfg):
        if hasattr(args, name) and getattr(args, name) is not None \
                and name != 'reassign':
            setattr(cfg, name, getattr(args, name))
    rp = ReassignParams()
    for name in vars(rp):
        if hasattr(args, name):
            setattr(rp, name, getattr(args, name))
    cfg.reassign = rp
    return cfg


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        prog='haphic-tpu',
        description='TPU-native Hi-C scaffolding (HapHiC-compatible), '
                    'version {} (update: {})'.format(__version__,
                                                     __update_time__))
    parser.add_argument('--version', action='version', version=__version__)
    parser.add_argument('--verbose', action='store_true')
    sub = parser.add_subparsers(dest='command', required=True)

    pp = sub.add_parser('pipeline', help='run the whole scaffolding pipeline')
    pp.add_argument('fasta')
    pp.add_argument('alignments', help='.pairs[.gz] or .bam Hi-C alignments')
    pp.add_argument('nchrs', type=int)
    pp.add_argument('--outdir', default='.')
    pp.add_argument('--steps', default='1234')
    _add_cluster_args(pp)
    _add_reassign_args(pp)
    _add_sort_args(pp)
    _add_build_args(pp)

    pc = sub.add_parser('cluster', help='run only the clustering stage')
    pc.add_argument('fasta')
    pc.add_argument('alignments')
    pc.add_argument('nchrs', type=int)
    pc.add_argument('--outdir', default='.')
    _add_cluster_args(pc)

    pb = sub.add_parser('build', help='build scaffolds from tour files')
    pb.add_argument('fasta')
    pb.add_argument('raw_fasta')
    pb.add_argument('alignments')
    pb.add_argument('tours', nargs='+')
    pb.add_argument('--corrected_ctgs', default=None)
    pb.add_argument('--outdir', default='.')
    _add_build_args(pb)

    pk = sub.add_parser('check', help='check runtime dependencies')

    pl = sub.add_parser('plot', help='draw contact-map heatmap')
    pl.add_argument('agp')
    pl.add_argument('alignments')
    pl.add_argument('--outdir', default='.')
    pl.add_argument('--bin_size', type=int, default=500,
                    help='heatmap bin size (kbp)')
    pl.add_argument('--normalization', default='KR',
                    choices=['KR', 'log10', 'none'])

    pr = sub.add_parser('refsort', help='reference-guided scaffold ordering')
    pr.add_argument('agp')
    pr.add_argument('paf')
    pr.add_argument('--fasta', default=None)
    return parser


def cmd_pipeline(args) -> int:
    from haphic_tpu.pipeline import run_pipeline
    cfg = _config_from_args(args)
    cfg.steps = args.steps
    run_pipeline(args.fasta, args.alignments, args.nchrs, cfg=cfg,
                 outdir=args.outdir)
    return 0


def cmd_cluster(args) -> int:
    from haphic_tpu.pipeline import cluster_stage
    cfg = _config_from_args(args)
    cluster_stage(args.fasta, args.alignments, args.nchrs, cfg, args.outdir)
    return 0


def cmd_build(args) -> int:
    from haphic_tpu.build.scaffolds import (build_final_scaffolds,
                                            generate_juicebox_script,
                                            parse_corrected_ctgs,
                                            parse_tours)
    from haphic_tpu.io.fasta import read_fasta
    asm = read_fasta(args.fasta)
    tours = parse_tours(args.tours, set(asm.names))
    corrected = parse_corrected_ctgs(args.corrected_ctgs)
    build_final_scaffolds(tours, asm, corrected, prefix=args.prefix,
                          Ns=args.Ns, max_width=args.max_width,
                          sort_by_input=args.sort_by_input,
                          outdir=args.outdir)
    generate_juicebox_script(args.raw_fasta, args.alignments,
                             prefix=args.prefix, outdir=args.outdir)
    return 0


def cmd_check(args) -> int:
    import importlib
    ok = True
    for mod in ('numpy', 'jax', 'scipy', 'sklearn'):
        try:
            m = importlib.import_module(mod)
            print('{:<12} {}'.format(mod, getattr(m, '__version__', '?')))
        except ImportError as e:
            ok = False
            print('{:<12} MISSING ({})'.format(mod, e))
    try:
        import jax
        print('{:<12} {}'.format('devices', jax.devices()))
    except Exception as e:
        ok = False
        print('devices check failed: {}'.format(e))
    return 0 if ok else 1


def cmd_plot(args) -> int:
    from haphic_tpu.post.plot import run_plot
    run_plot(args.agp, args.alignments, outdir=args.outdir,
             bin_size_kbp=args.bin_size, normalization=args.normalization)
    return 0


def cmd_refsort(args) -> int:
    from haphic_tpu.post.refsort import run_refsort
    run_refsort(args.agp, args.paf, fasta=args.fasta, out=sys.stdout)
    return 0


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    logging.basicConfig(
        level=logging.DEBUG if args.verbose else logging.INFO,
        format='%(asctime)s <%(module)s> [%(funcName)s] %(message)s',
        datefmt='%Y-%m-%d %H:%M:%S')
    return {
        'pipeline': cmd_pipeline,
        'cluster': cmd_cluster,
        'build': cmd_build,
        'check': cmd_check,
        'plot': cmd_plot,
        'refsort': cmd_refsort,
    }[args.command](args)


if __name__ == '__main__':
    sys.exit(main())
