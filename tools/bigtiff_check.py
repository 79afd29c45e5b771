#!/usr/bin/env python3
"""Independent BigTIFF / classic-TIFF IFD walker (pure stdlib).

Cross-validates graft's GeoTiff writer from OUTSIDE the JVM the way
TiffExternalSpec's JDK ImageIO pass validates classic TIFF (the JDK
plugin has no BigTIFF support). Parses the header (42/43), walks every
IFD, decodes tile/strip data (deflate or none), and prints one
`IFD <i> key=value ...` line per directory:

  width height bands bits compression planar sampleformat
  tiles        total data blocks declared
  sparse       blocks elided by the sparse-write path (offset 0)
  maxoff       largest block offset+length (proves LONG8 offsets carry)
  crc          crc32 over the concatenated DECOMPRESSED block bytes
               (materialized blocks only, block order)
  sum          integer sample sum over materialized blocks
               (uint8/uint16/int16/uint32 only; else -1)

Usage: python3 tools/bigtiff_check.py [--crc-only] FILE
       (--crc-only skips the python-slow per-sample sum: sum=-1)
"""
import struct
import sys
import zlib

TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4,
              10: 8, 11: 4, 12: 8, 16: 8, 17: 8, 18: 8}
FMT = {1: 'B', 3: 'H', 4: 'I', 8: 'h', 9: 'i', 11: 'f', 12: 'd', 16: 'Q'}


def read_ifds(f):
    head = f.read(8)
    if head[:2] != b'II':
        raise SystemExit('FAIL not little-endian TIFF')
    magic = struct.unpack('<H', head[2:4])[0]
    if magic == 42:
        big, first = False, struct.unpack('<I', head[4:8])[0]
    elif magic == 43:
        osize, zero = struct.unpack('<HH', head[4:8])
        if osize != 8 or zero != 0:
            raise SystemExit('FAIL malformed BigTIFF header')
        big, first = True, struct.unpack('<Q', f.read(8))[0]
    else:
        raise SystemExit('FAIL bad magic %d' % magic)
    ifds, off = [], first
    while off:
        f.seek(off)
        n = struct.unpack('<Q' if big else '<H', f.read(8 if big else 2))[0]
        entries = {}
        for _ in range(n):
            e = f.read(20 if big else 12)
            tag, typ = struct.unpack('<HH', e[:4])
            cnt = struct.unpack('<Q', e[4:12])[0] if big \
                else struct.unpack('<I', e[4:8])[0]
            val = e[12:20] if big else e[8:12]
            size = TYPE_SIZES.get(typ, 1) * cnt
            if size > (8 if big else 4):
                pos = struct.unpack('<Q' if big else '<I',
                                    val[:8 if big else 4])[0]
                cur = f.tell()
                f.seek(pos)
                data = f.read(size)
                f.seek(cur)
            else:
                data = val[:size]
            entries[tag] = (typ, cnt, data)
        off = struct.unpack('<Q' if big else '<I', f.read(8 if big else 4))[0]
        ifds.append(entries)
    return big, ifds


def nums(entry):
    typ, cnt, data = entry
    return list(struct.unpack('<%d%s' % (cnt, FMT[typ]), data))


def one(entry, default=None):
    return nums(entry)[0] if entry is not None else default


def main(path, crc_only=False):
    with open(path, 'rb') as f:
        big, ifds = read_ifds(f)
        print('FORMAT %s ifds=%d' % ('bigtiff' if big else 'classic',
                                     len(ifds)))
        for i, e in enumerate(ifds):
            width = one(e.get(256), 0)
            height = one(e.get(257), 0)
            bits = nums(e[258])[0] if 258 in e else 8
            comp = one(e.get(259), 1)
            spp = one(e.get(277), 1)
            planar = one(e.get(284), 1)
            sfmt = nums(e[339])[0] if 339 in e else 1
            offsets = nums(e[324]) if 324 in e else nums(e[273])
            counts = nums(e[325]) if 325 in e else nums(e[279])
            if len(offsets) != len(counts):
                raise SystemExit('FAIL IFD %d offsets/counts mismatch' % i)
            crc = 0
            total = 0
            sparse = 0
            maxoff = 0
            key = None if crc_only else \
                {(1, 8): 'B', (1, 16): 'H', (1, 32): 'I',
                 (2, 16): 'h', (2, 32): 'i'}.get((sfmt, bits))
            for off, cnt in zip(offsets, counts):
                if off == 0:
                    sparse += 1
                    continue
                maxoff = max(maxoff, off + cnt)
                f.seek(off)
                raw = f.read(cnt)
                if len(raw) != cnt:
                    raise SystemExit('FAIL IFD %d short block at %d' % (i, off))
                data = zlib.decompress(raw) if comp == 8 else raw
                crc = zlib.crc32(data, crc)
                if key is not None:
                    n = len(data) // struct.calcsize(key)
                    total += sum(struct.unpack('<%d%s' % (n, key), data))
            print('IFD %d width=%d height=%d bands=%d bits=%d compression=%d '
                  'planar=%d sampleformat=%d tiles=%d sparse=%d maxoff=%d '
                  'crc=%d sum=%d'
                  % (i, width, height, spp, bits, comp, planar, sfmt,
                     len(offsets), sparse, maxoff, crc,
                     total if key is not None else -1))


if __name__ == '__main__':
    args = sys.argv[1:]
    crc_only = '--crc-only' in args
    args = [a for a in args if a != '--crc-only']
    if len(args) != 1:
        raise SystemExit(__doc__)
    main(args[0], crc_only)
