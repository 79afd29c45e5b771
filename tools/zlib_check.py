#!/usr/bin/env python3
"""Bidirectional zlib cross-check for graft.cube.Compress (F11).

CompressSpec round-trips java.util.zip against itself; this harness gives
the independent side: python's zlib inflates what the engine deflated and
deflates what the engine must inflate, at every compression level.

Usage:
  python3 tools/zlib_check.py inflate IN OUT          # zlib stream -> raw
  python3 tools/zlib_check.py deflate LEVEL IN OUT    # raw -> zlib stream
"""
import sys
import zlib


def main(argv):
    if len(argv) >= 3 and argv[0] == 'inflate':
        with open(argv[1], 'rb') as f:
            data = zlib.decompress(f.read())
        with open(argv[2], 'wb') as f:
            f.write(data)
        print('OK inflate bytes=%d crc=%d' % (len(data), zlib.crc32(data)))
    elif len(argv) >= 4 and argv[0] == 'deflate':
        with open(argv[2], 'rb') as f:
            data = zlib.compress(f.read(), int(argv[1]))
        with open(argv[3], 'wb') as f:
            f.write(data)
        print('OK deflate bytes=%d' % len(data))
    else:
        raise SystemExit(__doc__)


if __name__ == '__main__':
    main(sys.argv[1:])
