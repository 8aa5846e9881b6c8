"""Exact (zero-tolerance) parity pins for the cross-path edge semantics.

The real-data parity suite (test_keff_parity.py) compares the broadcast,
histogram, and exact-sort integration paths with small tolerances whose slack
comes from documented discretization choices.  This file pins those choices
on synthetic cases where agreement — and every deliberate disagreement — is
EXACT:

* integer-valued tracer on exact bin edges: all three paths agree bit-for-bit
  off the terminal contour, and the histogram path's terminal entry exceeds
  the strict paths by exactly the area of the cells AT the extreme value
  (np.histogram's closed rightmost bin — the xhistogram semantics the
  reference inherits, /root/reference/xcontour/core.py:1284-1325);
* half-integer contours (no tracer value on any edge): all three paths agree
  bit-for-bit everywhere, endpoints included;
* analytic zonal tracer: the gt-flavored area tables differ by EXACTLY one
  grid row, and Yeq lookups by exactly one row spacing in the interior —
  the inclusive-vs-strict treatment of the row at y_k
  (/root/reference/xcontour/core.py:103-128).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from xcontour_tpu import core


def _paths(q, ctr, dA, lt):
    b = np.asarray(core.cal_integral_within_contours(q, ctr, dA, lt=lt))
    h = np.asarray(core.cal_integral_within_contours_hist(q, ctr, dA, lt=lt))
    e = np.asarray(core.cal_integral_within_contours_exact(q, ctr, dA, lt=lt))
    return b, h, e


@pytest.fixture(scope="module")
def integer_case():
    ny, nx = 16, 32
    q = jnp.asarray(np.repeat(np.arange(8.0), 2)[:, None]
                    * np.ones((1, nx)))          # values 0..7, 64 cells each
    dA = jnp.ones((ny, nx))
    return q, dA, nx


class TestIntegerEdges:
    @pytest.mark.parametrize("decreasing", [False, True])
    @pytest.mark.parametrize("lt", [True, False])
    def test_exact_sort_equals_broadcast_everywhere(self, integer_case, lt,
                                                    decreasing):
        q, dA, _ = integer_case
        ctr = jnp.asarray(np.arange(8.0)[::-1].copy() if decreasing
                          else np.arange(8.0))
        b, h, e = _paths(q, ctr, dA, lt)
        np.testing.assert_array_equal(e, b)

    @pytest.mark.parametrize("decreasing", [False, True])
    @pytest.mark.parametrize("lt", [True, False])
    def test_hist_tie_accounting_per_element(self, integer_case, lt,
                                             decreasing):
        """With tracer values exactly on bin edges the hist path differs from
        the strict broadcast path by EXACTLY the tied-cell areas, following
        np.histogram's half-open bins with a closed rightmost bin:

        * lt:  bins are [c_{k-1}, c_k) so CDF(<c) is strict — equal to
               broadcast everywhere EXCEPT the max contour, which gains the
               area tied at the maximum (closed last bin);
        * gt:  total - CDF gives at-or-above, so EVERY contour gains its own
               tie area — except the max contour, whose ties were already
               swallowed by the closed last bin.
        """
        q, dA, nx = integer_case
        levels = np.arange(8.0)[::-1].copy() if decreasing else np.arange(8.0)
        ctr = jnp.asarray(levels)
        b, h, e = _paths(q, ctr, dA, lt)
        qn = np.asarray(q)
        dn = np.asarray(dA)
        tie = np.array([float(dn[qn == c].sum()) for c in levels])
        assert np.all(tie == 2 * nx)           # sanity: two rows per level
        at_max = levels == levels.max()
        if lt:
            expect = b + np.where(at_max, tie, 0.0)
        else:
            expect = b + np.where(at_max, 0.0, tie)
        np.testing.assert_array_equal(h, expect)

    @pytest.mark.parametrize("lt", [True, False])
    def test_half_integer_contours_all_paths_exact(self, integer_case, lt):
        """No tracer value on any bin edge: zero tolerance across all three
        paths, endpoints included."""
        q, dA, _ = integer_case
        ctr = jnp.asarray(np.arange(8) - 0.5 + 1.0)   # 0.5 .. 7.5
        b, h, e = _paths(q, ctr, dA, lt)
        np.testing.assert_array_equal(h, b)
        np.testing.assert_array_equal(e, b)

    @pytest.mark.parametrize("lt", [True, False])
    def test_weighted_integrand_exact(self, integer_case, lt):
        """Same pins hold with a non-trivial integrand (f*dA weights)."""
        q, dA, _ = integer_case
        f = jnp.asarray(np.arange(q.size, dtype=np.float64).reshape(q.shape))
        ctr = jnp.asarray(np.arange(8) + 0.5)         # off-edge
        b = np.asarray(core.cal_integral_within_contours(
            q, ctr, dA, integrand=f, lt=lt))
        h = np.asarray(core.cal_integral_within_contours_hist(
            q, ctr, dA, integrand=f, lt=lt))
        e = np.asarray(core.cal_integral_within_contours_exact(
            q, ctr, dA, integrand=f, lt=lt))
        np.testing.assert_array_equal(h, b)
        np.testing.assert_array_equal(e, b)


class TestAnalyticAreaTableShift:
    """Zonal analytic case: q = row index, unit cells (Ny=8, Nx=4), total
    area 32.  A(y_k) is a row count times 4, so every table entry and lookup
    has a closed form."""

    def _tables(self, increase, lt):
        ny, nx = 8, 4
        ydef = jnp.asarray(np.arange(ny, dtype=np.float64))
        dA = jnp.ones((ny, nx))
        mask = jnp.ones((ny, nx))
        tb = core.cal_area_eqCoord_table(mask, ydef, dA,
                                         increase=increase, lt=lt)
        th = core.cal_area_eqCoord_table_hist(mask, ydef, dA,
                                              increase=increase, lt=lt)
        return np.asarray(tb.values), np.asarray(th.values), tb, th

    @pytest.mark.parametrize("increase,lt",
                             [(True, True), (False, False)])
    def test_lt_flavored_tables_identical(self, increase, lt):
        vb, vh, tb, th = self._tables(increase, lt)
        # closed form: A(y_k) = 4k for k<7, endpoint forced to the total 32
        # (reference core.py:133-142)
        want = np.append(4.0 * np.arange(7), 32.0)
        np.testing.assert_array_equal(vb, want)
        np.testing.assert_array_equal(vh, want)
        areas = jnp.asarray([4.0, 12.0, 20.0])
        np.testing.assert_array_equal(
            np.asarray(tb.lookup_coordinates(areas)), [1.0, 3.0, 5.0])
        np.testing.assert_array_equal(
            np.asarray(th.lookup_coordinates(areas)), [1.0, 3.0, 5.0])

    @pytest.mark.parametrize("increase,lt",
                             [(True, False), (False, True)])
    def test_gt_flavored_shift_is_exactly_one_row(self, increase, lt):
        vb, vh, tb, th = self._tables(increase, lt)
        # broadcast: strictly-above count, A_b(y_k) = 4(7-k), ends forced
        np.testing.assert_array_equal(
            vb, np.append(32.0, 4.0 * (7 - np.arange(1, 8))))
        # hist: at-or-above count A_h(y_k) = 4(8-k) — the strictly-above
        # table shifted by EXACTLY one row (both tables' ends forced to the
        # total / zero, so the shift is visible from the second entry)
        np.testing.assert_array_equal(
            vh, np.concatenate([[32.0], 4.0 * (8 - np.arange(1, 7)), [0.0]]))
        np.testing.assert_array_equal(vh[2:-1], vb[1:-2])
        # interior lookups therefore differ by exactly one row spacing
        areas = jnp.asarray([12.0, 20.0])
        yb = np.asarray(tb.lookup_coordinates(areas))
        yh = np.asarray(th.lookup_coordinates(areas))
        np.testing.assert_array_equal(yb, [4.0, 2.0])
        np.testing.assert_array_equal(yh - yb, [1.0, 1.0])
