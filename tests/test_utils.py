"""Observability utilities (utils/): finiteness guards + timing helper."""

import jax
import jax.numpy as jnp
import numpy as np

from quadrotorilqr_tpu.utils import check_finite, nonfinite_report, time_compiled


def test_check_finite_mask():
    tree = {
        "a": jnp.asarray([[1.0, 2.0], [jnp.nan, 1.0], [3.0, jnp.inf]]),
        "b": jnp.ones((3, 4)),
    }
    mask = np.asarray(check_finite(tree))
    np.testing.assert_array_equal(mask, [True, False, False])


def test_nonfinite_report():
    tree = {"x": jnp.asarray([1.0, jnp.nan, jnp.nan]), "y": jnp.ones(2)}
    rep = nonfinite_report(tree)
    assert list(rep.values()) == [2]
    assert "x" in next(iter(rep))


def test_time_compiled():
    f = lambda x: (x * 2.0,)
    p50, compile_s, out = time_compiled(f, (jnp.ones((8, 8)),), repeats=2)
    assert p50 >= 0.0 and compile_s > 0.0
    assert float(out[0]) == 128.0


def test_checkify_solve_flags_nan():
    from quadrotorilqr_tpu.utils import checkify_solve

    bad = checkify_solve(lambda x: jnp.log(x) / x)
    err, _ = jax.jit(bad)(jnp.asarray(-1.0))
    try:
        err.throw()
        raised = False
    except Exception:
        raised = True
    assert raised


def test_chunk_slope_returns_positive_device_time():
    """utils/profiling.chunk_slope: the chained-launch slope estimator
    returns a positive per-body device time and per-chunk walls that grow
    with the chunk size (the fit's raw points), on a trivial body."""
    import jax.numpy as jnp

    from quadrotorilqr_tpu.utils.profiling import chunk_slope

    x = jnp.ones((256, 256), jnp.float32)

    def body(carry, a):
        # heavy enough (~8 matmuls) that the per-body time dominates
        # launch noise and the fitted slope is reliably positive
        y = a + carry[0]
        for _ in range(8):
            y = y @ a * 1e-3
        return jnp.stack(
            [jnp.sum(y) * 1e-9, jnp.mean(y), jnp.max(y)]
        )

    device_s, intercept, raw = chunk_slope(
        body, (x,), chunks=(1, 8, 32), repeats=3
    )
    # a trivial body on a contended CPU can time noisily — assert only
    # the structural contract (positive slope fit, all chunks measured)
    assert device_s is not None and device_s > 0
    assert intercept >= 0
    assert set(raw) == {1, 8, 32} and all(v > 0 for v in raw.values())
