"""Level-1 sparse vector ops: axpyi, doti/dotci/dotui, gthr, roti, sctr.

Mirrors reference samples sample_axpyi.cpp, sample_dotp.cpp,
sample_zgthr.cpp, sample_roti.cpp, sample_sctr.cpp in one program."""

import numpy as np
from _common import check

import aoclsparse_tpu as asp

# sparse vector x held as (values, indices) against dense y
xv = np.array([1.0, 2.0, 3.0, 4.0])
xi = np.array([0, 3, 5, 7], dtype=np.int32)
y = np.arange(8, dtype=np.float64)

check("axpyi  y += 2*x", asp.axpyi(2.0, xv, xi, y), y + np.bincount(xi, 2.0 * xv, 8))
check("doti   <x, y>", asp.doti(xv, xi, y), float(np.dot(xv, y[xi])))

zc = xv.astype(np.complex128) + 1j
yc = y.astype(np.complex128) - 2j
check("dotci  <conj(x), y>", asp.dotci(zc, xi, yc), np.dot(zc.conj(), yc[xi]))
check("dotui  <x, y>", asp.dotui(zc, xi, yc), np.dot(zc, yc[xi]))

check("gthr", asp.gthr(y, xi), y[xi])
g, yz = asp.gthrz(y, xi)
check("gthrz gathered", g, y[xi])
check("gthrz zeroed", yz[np.asarray(xi)], np.zeros(4))

c, s = 0.8, 0.6
xr, yr = asp.roti(xv, xi, y, c, s)
check("roti x'", xr, c * xv + s * y[xi])
want_y = y.copy()
want_y[xi] = c * y[xi] - s * xv
check("roti y'", yr, want_y)

check("sctr", asp.sctr(xv, xi, np.zeros(8)), np.bincount(xi, xv, 8))
