"""Test-only bridge to the upstream reference implementation.

The reference at /root/reference is used as a *parity oracle* in tests:
we import its pure-Python functions (with light stubs for pysam/portion,
which are absent from this environment) and assert our vectorized
implementations produce identical results. No reference code is copied
into the package.
"""

import sys
import types

REF_SCRIPTS = '/root/reference/scripts'
REF_SIMULATION = '/root/reference/simulation'
REF_UTILS = '/root/reference/utils'


class _Interval:
    """Minimal portion-compatible closed-interval union (enough for
    detect_break_points-style usage: |, -, len, iteration, lower/upper)."""

    def __init__(self, spans=()):
        self.spans = self._merge(list(spans))

    @staticmethod
    def _merge(spans):
        spans = sorted((s for s in spans if s[0] <= s[1]))
        out = []
        for lo, hi in spans:
            if out and lo <= out[-1][1]:
                out[-1] = (out[-1][0], max(out[-1][1], hi))
            else:
                out.append((lo, hi))
        return out

    def __or__(self, other):
        return _Interval(self.spans + other.spans)

    def __ior__(self, other):
        return self.__or__(other)

    def __sub__(self, other):
        # closed-interval difference; adjacent (touching) endpoints vanish
        result = []
        for lo, hi in self.spans:
            pieces = [(lo, hi)]
            for olo, ohi in other.spans:
                nxt = []
                for plo, phi in pieces:
                    if ohi < plo or olo > phi:
                        nxt.append((plo, phi))
                        continue
                    if olo > plo:
                        nxt.append((plo, olo))
                    if ohi < phi:
                        nxt.append((ohi, phi))
                pieces = nxt
            result.extend(pieces)
        return _Interval(result)

    def __and__(self, other):
        out = []
        for lo, hi in self.spans:
            for olo, ohi in other.spans:
                nlo, nhi = max(lo, olo), min(hi, ohi)
                if nlo <= nhi:
                    out.append((nlo, nhi))
        return _Interval(out)

    def __contains__(self, x):
        return any(lo <= x <= hi for lo, hi in self.spans)

    def __eq__(self, other):
        return isinstance(other, _Interval) and self.spans == other.spans

    def __hash__(self):
        return hash(tuple(self.spans))

    def __len__(self):
        return len(self.spans)

    def __iter__(self):
        for lo, hi in self.spans:
            yield _Interval([(lo, hi)])

    @property
    def lower(self):
        return self.spans[0][0]

    @property
    def upper(self):
        return self.spans[-1][1]

    def __bool__(self):
        return bool(self.spans)


def _install_stubs():
    if 'pysam' not in sys.modules:
        try:
            import pysam  # noqa: F401
        except ImportError:
            stub = types.ModuleType('pysam')
            stub.set_verbosity = lambda *a, **k: None
            stub.AlignmentFile = object
            sys.modules['pysam'] = stub
    if 'portion' not in sys.modules:
        try:
            import portion  # noqa: F401
        except ImportError:
            stub = types.ModuleType('portion')
            stub.closed = lambda a, b: _Interval([(a, b)])
            stub.empty = lambda: _Interval()
            sys.modules['portion'] = stub


def load(module_name):
    """Import a reference script module (e.g. 'HapHiC_cluster' or a
    simulation-harness module like 'evaluate_scaffolds')."""
    _install_stubs()
    for path in (REF_SCRIPTS, REF_SIMULATION, REF_UTILS):
        if path not in sys.path:
            sys.path.insert(0, path)
    return __import__(module_name)
