"""Invertibility + log-det-jacobian correctness for every flow primitive.

The reference repo has no test suite; its only correctness idiom is the
forward/inverse/ldj cross-check in exponential_coupling.py's __main__
(SURVEY.md section 4). Here every bijection gets:
  * round-trip |x - inv(fwd(x))| -> 0
  * ldj == slogdet of the per-point jacobian (via jax.jacfwd on small dims)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flowcompare_tpu.core.mlp import gelu
from flowcompare_tpu.flows import actnorm, coupling, distributions, permuters, spline

KEY = jax.random.PRNGKey(0)
B, N, D = 2, 5, 6
CTX_DIM = 3


def _x(key=KEY, d=D):
    return jax.random.normal(key, (B, N, d))


def _ctx(key=jax.random.PRNGKey(7)):
    return jax.random.normal(key, (B, N, CTX_DIM))


def check_ldj_vs_jacobian(fwd_point, x, ldj, atol=1e-4):
    """fwd_point: (d,) -> (d,) for a fixed (batch, point); compare slogdet."""
    for b in range(x.shape[0]):
        for n in range(x.shape[1]):
            jac = jax.jacfwd(lambda v: fwd_point(v, b, n))(x[b, n])
            _, logdet = jnp.linalg.slogdet(jac)
            np.testing.assert_allclose(ldj[b, n], logdet, atol=atol, rtol=1e-4)


# ---------------------------------------------------------------- couplings

@pytest.mark.parametrize("scale_fn", ["sigmoid", "exp"])
@pytest.mark.parametrize("with_ctx", [False, True])
def test_affine_coupling(scale_fn, with_ctx):
    ctx_dim = CTX_DIM if with_ctx else 0
    params = coupling.init_affine_coupling(KEY, D, [16, 16], context_dim=ctx_dim)
    x, ctx = _x(), _ctx() if with_ctx else None
    y, ldj = coupling.affine_coupling_forward(
        params, x, ctx, nonlin=gelu, scale_fn_type=scale_fn)
    x_rec = coupling.affine_coupling_inverse(
        params, y, ctx, nonlin=gelu, scale_fn_type=scale_fn)
    np.testing.assert_allclose(x, x_rec, atol=1e-5)

    def fwd_point(v, b, n):
        xb = x.at[b, n].set(v)
        yb, _ = coupling.affine_coupling_forward(
            params, xb, ctx, nonlin=gelu, scale_fn_type=scale_fn)
        return yb[b, n]

    check_ldj_vs_jacobian(fwd_point, x, ldj)


def test_exponential_coupling():
    params = coupling.init_exponential_coupling(KEY, D, [16, 16], context_dim=CTX_DIM)
    x, ctx = _x(), _ctx()
    y, ldj = coupling.exponential_coupling_forward(params, x, ctx, nonlin=gelu)
    x_rec = coupling.exponential_coupling_inverse(params, y, ctx, nonlin=gelu)
    np.testing.assert_allclose(x, x_rec, atol=1e-5)

    def fwd_point(v, b, n):
        xb = x.at[b, n].set(v)
        yb, _ = coupling.exponential_coupling_forward(params, xb, ctx, nonlin=gelu)
        return yb[b, n]

    # exact to 2.8e-9 in f64; f32 roundoff through expm+slogdet needs slack
    check_ldj_vs_jacobian(fwd_point, x, ldj, atol=5e-3)


def test_spline_coupling():
    params = spline.init_spline_coupling(KEY, D, [16, 16], num_bins=8,
                                         context_dim=CTX_DIM)
    # mix of in-domain and tail points
    x = _x() * 2.0
    ctx = _ctx()
    y, ldj = spline.spline_coupling_forward(params, x, ctx, nonlin=gelu)
    x_rec = spline.spline_coupling_inverse(params, y, ctx, nonlin=gelu)
    np.testing.assert_allclose(x, x_rec, atol=1e-4)

    def fwd_point(v, b, n):
        xb = x.at[b, n].set(v)
        yb, _ = spline.spline_coupling_forward(params, xb, ctx, nonlin=gelu)
        return yb[b, n]

    check_ldj_vs_jacobian(fwd_point, x, ldj, atol=1e-3)


# ------------------------------------------------------------------ actnorm

def test_actnorm_roundtrip_and_ldj():
    params = {"shift": jnp.array([[0.3, -1.0, 0.5, 0.0, 2.0, -0.2]]),
              "log_scale": jnp.array([[0.1, -0.4, 0.0, 0.7, -0.1, 0.2]])}
    x = _x()
    z, ldj = actnorm.actnorm_forward(params, x)
    np.testing.assert_allclose(x, actnorm.actnorm_inverse(params, z), atol=1e-6)
    expected = -jnp.sum(params["log_scale"])
    np.testing.assert_allclose(ldj, jnp.full((B, N), expected), atol=1e-6)


def test_actnorm_data_init_standardizes():
    x = 3.0 + 2.5 * jax.random.normal(KEY, (8, 64, D))
    params = actnorm.actnorm_data_init(x)
    z, _ = actnorm.actnorm_forward(params, x)
    flat = z.reshape(-1, D)
    np.testing.assert_allclose(np.asarray(jnp.mean(flat, 0)), 0.0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(jnp.std(flat, 0, ddof=1)), 1.0, atol=1e-3)


# ---------------------------------------------------------------- permuters

def test_linear_lu():
    params = permuters.init_linear_lu(D, identity_init=False, key=KEY)
    x = _x()
    z, ldj = permuters.linear_lu_forward(params, x)
    np.testing.assert_allclose(x, permuters.linear_lu_inverse(params, z), atol=1e-5)

    def fwd_point(v, b, n):
        xb = x.at[b, n].set(v)
        zb, _ = permuters.linear_lu_forward(params, xb)
        return zb[b, n]

    check_ldj_vs_jacobian(fwd_point, x, ldj)


def test_linear_lu_identity_init_is_near_identity():
    params = permuters.init_linear_lu(D, identity_init=True)
    x = _x()
    z, _ = permuters.linear_lu_forward(params, x)
    np.testing.assert_allclose(x, z, atol=1e-2)


def test_permuter_and_reverse():
    p = permuters.init_permuter(KEY, D)
    x = _x()
    y, ldj = permuters.permuter_forward(p, x)
    np.testing.assert_allclose(x, permuters.permuter_inverse(p, y), atol=0)
    assert float(jnp.abs(ldj).max()) == 0.0
    r = permuters.init_reverse(D)
    y, _ = permuters.permuter_forward(r, x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x)[..., ::-1], atol=0)


def test_full_combiner():
    p = permuters.init_full_combiner(KEY, D)
    x = _x()
    y, ldj = permuters.full_combiner_forward(p, x)
    np.testing.assert_allclose(x, permuters.full_combiner_inverse(p, y), atol=1e-5)

    def fwd_point(v, b, n):
        xb = x.at[b, n].set(v)
        yb, _ = permuters.full_combiner_forward(p, xb)
        return yb[b, n]

    check_ldj_vs_jacobian(fwd_point, x, ldj)


def test_exponential_combiner():
    p = permuters.init_exponential_combiner(KEY, D)
    x = _x()
    y, ldj = permuters.exponential_combiner_forward(p, x)
    np.testing.assert_allclose(
        x, permuters.exponential_combiner_inverse(p, y), atol=1e-4)

    def fwd_point(v, b, n):
        xb = x.at[b, n].set(v)
        yb, _ = permuters.exponential_combiner_forward(p, xb)
        return yb[b, n]

    check_ldj_vs_jacobian(fwd_point, x, ldj)


# ------------------------------------------------------------ distributions

def test_standard_normal_logprob_matches_formula():
    x = _x()
    lp = distributions.standard_normal_logprob(x)
    import math
    expected = np.sum(-0.5 * math.log(2 * math.pi) - 0.5 * np.asarray(x) ** 2, -1)
    np.testing.assert_allclose(np.asarray(lp), expected, rtol=1e-6)


def test_normal_logprob_scaling():
    x = _x()
    lp = distributions.normal_logprob(x, 0.5, 2.0)
    z = (np.asarray(x) - 0.5) / 2.0
    import math
    expected = np.sum(
        -0.5 * math.log(2 * math.pi) - math.log(2.0) - 0.5 * z ** 2, -1)
    np.testing.assert_allclose(np.asarray(lp), expected, rtol=1e-5)


def test_conditional_normal_sample_logprob_consistency():
    from flowcompare_tpu.core.mlp import init_mlp
    net = init_mlp(KEY, CTX_DIM, [8], 2 * D)
    ctx = _ctx()
    z, lp = distributions.conditional_normal_sample_with_logprob(
        net, jax.random.PRNGKey(3), ctx, gelu)
    lp2 = distributions.conditional_normal_logprob(net, z, ctx, gelu)
    np.testing.assert_allclose(np.asarray(lp), np.asarray(lp2), rtol=1e-5)
