"""Label colormap (role of reference diffphys/colors.py).

Generated with the standard PASCAL-VOC bit-interleaving procedure instead
of a hardcoded table.
"""

import numpy as np


def label_colormap(n=65):
    def bitget(v, i):
        return (v >> i) & 1

    cmap = np.zeros((n, 3), np.int64)
    for i in range(n):
        r = g = b = 0
        c = i
        for j in range(8):
            r |= bitget(c, 0) << (7 - j)
            g |= bitget(c, 1) << (7 - j)
            b |= bitget(c, 2) << (7 - j)
            c >>= 3
        cmap[i] = [r, g, b]
    return cmap
