"""Bitstream file container — byte-compatible with the reference format.

Layout (reference utils/IOutils.py:25-88):
  header:  >2I  (img_h, img_w)                      [written by the tester]
  body:    >3I  (latent_h, latent_w, n_string_lists)
           per list: >I count, then per string: >I length + raw bytes
"""

import struct
from typing import BinaryIO, Sequence


def write_uints(fd: BinaryIO, values: Sequence[int]) -> int:
    fd.write(struct.pack(f">{len(values)}I", *values))
    return len(values) * 4


def read_uints(fd: BinaryIO, n: int) -> tuple:
    return struct.unpack(f">{n}I", fd.read(n * 4))


def write_body(fd: BinaryIO, shape: Sequence[int], out_strings) -> int:
    cnt = write_uints(fd, (shape[0], shape[1], len(out_strings)))
    for string_list in out_strings:
        cnt += write_uints(fd, (len(string_list),))
        for s in string_list:
            cnt += write_uints(fd, (len(s),))
            fd.write(s)
            cnt += len(s)
    return cnt


def read_body(fd: BinaryIO):
    lstrings = []
    shape = read_uints(fd, 2)
    n_strings = read_uints(fd, 1)[0]
    for _ in range(n_strings):
        num = read_uints(fd, 1)[0]
        slist = []
        for _ in range(num):
            length = read_uints(fd, 1)[0]
            slist.append(fd.read(length))
        lstrings.append(slist)
    return lstrings, shape
