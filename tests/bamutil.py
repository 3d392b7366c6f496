"""Minimal BAM/BGZF *writer* used to generate test fixtures (the
production code only reads BAM; pysam is not available here)."""

import struct
import zlib


def bgzf_block(payload: bytes) -> bytes:
    comp = zlib.compressobj(6, zlib.DEFLATED, -15)
    cdata = comp.compress(payload) + comp.flush()
    bsize = len(cdata) + 12 + 6 + 8
    header = (b'\x1f\x8b\x08\x04' + b'\x00' * 6 +
              struct.pack('<H', 6) + b'BC' + struct.pack('<H', 2) +
              struct.pack('<H', bsize - 1))
    tail = struct.pack('<II', zlib.crc32(payload) & 0xffffffff,
                       len(payload))
    return header + cdata + tail


BGZF_EOF = bytes.fromhex(
    '1f8b08040000000000ff0600424302001b0003000000000000000000')


CIGAR_OPS = 'MIDNSHP=X'


def bam_record(refid, pos, mrefid, mpos, flag, mapq=60, name=b'r',
               nm=None, tlen=0, cigar=None, tags=None):
    """cigar: [(op_char, length)]; tags: [(b'AS', int)]."""
    aux = b''
    if nm is not None:
        aux += b'NM' + b'i' + struct.pack('<i', nm)
    for t, v in (tags or []):
        aux += t + b'i' + struct.pack('<i', v)
    cig = b''
    n_cigar = 0
    if cigar:
        for op, ln in cigar:
            cig += struct.pack('<I', (ln << 4) | CIGAR_OPS.index(op))
            n_cigar += 1
    body = struct.pack('<iiBBHHHIiii', refid, pos, len(name) + 1, mapq,
                       0, n_cigar, flag, 0, mrefid, mpos, tlen)
    body += name + b'\x00' + cig + aux
    return struct.pack('<I', len(body)) + body


def write_bam(path, ref_names, ref_lens, records, so='unknown'):
    """records: iterable of bam_record() byte strings."""
    text = '@HD\tVN:1.6\tSO:{}\n'.format(so).encode()
    hdr = b'BAM\x01' + struct.pack('<I', len(text)) + text
    hdr += struct.pack('<I', len(ref_names))
    for n, l in zip(ref_names, ref_lens):
        nb = n.encode() + b'\x00'
        hdr += struct.pack('<I', len(nb)) + nb + struct.pack('<I', l)
    payload = hdr + b''.join(records)
    with open(path, 'wb') as f:
        # split into multiple blocks to exercise the block-spanning path
        step = 50000
        for i in range(0, len(payload), step):
            f.write(bgzf_block(payload[i:i + step]))
        f.write(BGZF_EOF)
