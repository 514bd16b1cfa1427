"""Unit tests for core ops against NumPy / reference oracles."""

import numpy as np
import jax.numpy as jnp

from mvrecon_tpu.ops import (
    factorization_method,
    inv3x3,
    min_eigvec_sym,
    orthonormalize,
    rodrigues,
    unit_vec,
)
from mvrecon_tpu.ops.linalg import blockdiag_scatter
from mvrecon_tpu.ops.moments import sym_expand, sym_reduce


def test_unit_vec():
    v = np.array([3.0, 0.0, 4.0])
    np.testing.assert_allclose(np.asarray(unit_vec(jnp.asarray(v))), v / 5.0)


def test_rodrigues_matches_reference(ref):
    rng = np.random.default_rng(0)
    for _ in range(20):
        omega = rng.normal(size=3) * rng.uniform(0.01, 3.0)
        expected = ref.utils.get_rotation_matrix(omega)
        got = np.asarray(rodrigues(jnp.asarray(omega)))
        np.testing.assert_allclose(got, expected, atol=1e-12)


def test_rodrigues_zero_is_identity():
    got = np.asarray(rodrigues(jnp.zeros(3)))
    np.testing.assert_allclose(got, np.eye(3), atol=1e-15)


def test_rodrigues_tiny_angle_taylor():
    omega = jnp.array([1e-10, -2e-10, 5e-11])
    got = np.asarray(rodrigues(omega))
    assert np.isfinite(got).all()
    np.testing.assert_allclose(got, np.eye(3), atol=1e-9)


def test_factorization_matches_reference(ref):
    rng = np.random.default_rng(1)
    w = rng.normal(size=(20, 50))
    m_ref, s_ref = ref.factorization.factorization_method(w, n_rank=4)
    m, s = factorization_method(jnp.asarray(w), n_rank=4)
    # Column signs of SVD are convention-dependent; compare the product.
    np.testing.assert_allclose(np.asarray(m @ s), m_ref @ s_ref, atol=1e-10)
    np.testing.assert_allclose(np.abs(np.asarray(m)), np.abs(m_ref), atol=1e-10)


def test_inv3x3():
    rng = np.random.default_rng(2)
    m = rng.normal(size=(100, 3, 3)) + 3 * np.eye(3)
    got = np.asarray(inv3x3(jnp.asarray(m)))
    np.testing.assert_allclose(got, np.linalg.inv(m), atol=1e-10)


def test_min_eigvec_sym():
    rng = np.random.default_rng(3)
    a = rng.normal(size=(6, 6))
    a = a + a.T
    w, v = min_eigvec_sym(jnp.asarray(a))
    ew, ev = np.linalg.eigh(a)
    np.testing.assert_allclose(float(w), ew[0], atol=1e-10)
    np.testing.assert_allclose(np.abs(np.asarray(v)), np.abs(ev[:, 0]), atol=1e-8)


def test_orthonormalize():
    rng = np.random.default_rng(4)
    m = rng.normal(size=(5, 3, 3))
    r = np.asarray(orthonormalize(jnp.asarray(m)))
    eye = np.einsum("fij,fkj->fik", r, r)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), (5, 3, 3)), atol=1e-10)
    # healthy input also agrees with the SVD polar factor U Vt
    u, _, vt = np.linalg.svd(m)
    np.testing.assert_allclose(r, u @ vt, atol=1e-8)


def test_orthonormalize_rank_deficient():
    """(Near-)singular input takes the orthogonal-completion branch:
    the Gram inverse-square-root formula is 0/0 along null directions
    (previously Inf/garbage), but the SVD polar factor is well-defined
    for rank-deficient matrices and the output must stay orthogonal."""
    rng = np.random.default_rng(11)
    a = rng.normal(size=(3, 3))
    b = rng.normal(size=(3, 3))
    cases = np.stack([
        a - np.outer(a @ np.linalg.svd(a)[2][2], np.linalg.svd(a)[2][2]),
        np.outer(b[0], b[1]),          # rank 1
        np.zeros((3, 3)),              # rank 0
        a * 1e-200,                    # tiny but full rank (f64 underflow zone)
    ])
    # exact rank-2: zero out the smallest singular value of `a`
    u, s, vt = np.linalg.svd(a)
    cases[0] = (u * np.array([s[0], s[1], 0.0])) @ vt
    r = np.asarray(orthonormalize(jnp.asarray(cases)))
    assert np.isfinite(r).all()
    eye = np.einsum("fij,fkj->fik", r, r)
    np.testing.assert_allclose(
        eye, np.broadcast_to(np.eye(3), (4, 3, 3)), atol=1e-8
    )
    # the rank-2 case must keep the two healthy singular directions:
    # R v_i = u_i for i with s_i > 0
    for i in range(2):
        np.testing.assert_allclose(r[0] @ vt[i], u[:, i], atol=1e-8)


def test_blockdiag_scatter():
    rng = np.random.default_rng(5)
    blocks = rng.normal(size=(4, 3, 3))
    got = np.asarray(blockdiag_scatter(jnp.asarray(blocks)))
    import scipy.linalg

    np.testing.assert_allclose(got, scipy.linalg.block_diag(*blocks))


def test_sym_reduce_expand_roundtrip_n3():
    rng = np.random.default_rng(6)
    t_sym = rng.normal(size=(3, 3))
    t_sym = t_sym + t_sym.T
    # Pack T into the reduced tau layout used by the reference, expand back.
    tau = np.array(
        [
            t_sym[0, 0],
            t_sym[1, 1],
            t_sym[2, 2],
            np.sqrt(2) * t_sym[1, 2],
            np.sqrt(2) * t_sym[0, 2],
            np.sqrt(2) * t_sym[0, 1],
        ]
    )
    got = np.asarray(sym_expand(jnp.asarray(tau), 3))
    np.testing.assert_allclose(got, t_sym, atol=1e-12)


def test_sym_reduce_quadratic_form_identity():
    """<B_cal, T x T> must be preserved by the reduced 6x6 form:
    tau^T B6 tau == sum_ijkl B_cal[ijkl] T[ij] T[kl] for symmetric T."""
    rng = np.random.default_rng(7)
    v = rng.normal(size=(5, 3, 9))
    # make each basis row a flattened symmetric matrix
    vm = v.reshape(5, 3, 3, 3)
    vm = vm + vm.transpose(0, 1, 3, 2)
    v = vm.reshape(5, 3, 9)
    c = rng.normal(size=(5, 3, 3))
    c = c + c.transpose(0, 2, 1)
    bcal = np.einsum("fab,fai,fbj->ij", c, v, v)
    b6 = np.asarray(sym_reduce(jnp.asarray(bcal), 3))

    t_sym = rng.normal(size=(3, 3))
    t_sym = t_sym + t_sym.T
    tau = np.array(
        [
            t_sym[0, 0],
            t_sym[1, 1],
            t_sym[2, 2],
            np.sqrt(2) * t_sym[1, 2],
            np.sqrt(2) * t_sym[0, 2],
            np.sqrt(2) * t_sym[0, 1],
        ]
    )
    lhs = tau @ b6 @ tau
    rhs = np.einsum("ij,kl,ikjl->", t_sym, t_sym, bcal.reshape(3, 3, 3, 3))
    # note: bcal flat index is [3i+j, 3k+l] -> tensor index [i, j, k, l]
    rhs = np.einsum("ij,kl,ijkl->", t_sym, t_sym, bcal.reshape(3, 3, 3, 3))
    np.testing.assert_allclose(lhs, rhs, rtol=1e-10)


def test_jacobi_eigh_matches_lapack():
    """Pure-XLA batched Jacobi (ops/linalg.py) == np.linalg.eigh for the
    small symmetric batches the pipelines feed it (grams 4x4 / 12x12,
    affine B 6x6, DAQ 10x10; odd n exercises the decoupled pad)."""
    from mvrecon_tpu.ops.linalg import jacobi_eigh

    rng = np.random.default_rng(3)
    for n in (3, 4, 6, 10, 12):
        b = rng.standard_normal((40, n, n))
        for mat in ((b + b.swapaxes(-1, -2)) / 2,
                    np.einsum("bij,bkj->bik", b, b)):
            w, v = jacobi_eigh(jnp.asarray(mat))
            w, v = np.asarray(w), np.asarray(v)
            wr, _ = np.linalg.eigh(mat)
            scale = np.abs(wr).max()
            np.testing.assert_allclose(w, wr, atol=1e-12 * scale)
            rec = np.einsum("bik,bk,bjk->bij", v, w, v)
            np.testing.assert_allclose(rec, mat, atol=1e-12 * scale)
            vv = np.einsum("bki,bkj->bij", v, v)
            np.testing.assert_allclose(vv, np.broadcast_to(np.eye(n), vv.shape),
                                       atol=1e-12)


def test_jacobi_eigh_degenerate_and_diagonal():
    """Repeated eigenvalues and already-diagonal input (zero rotations)."""
    from mvrecon_tpu.ops.linalg import jacobi_eigh

    d = jnp.asarray(np.diag([3.0, -1.0, 2.0, 2.0]))[None]
    w, v = jacobi_eigh(d)
    np.testing.assert_allclose(np.asarray(w)[0], [-1.0, 2.0, 2.0, 3.0])
    # eigenvalue 2 has multiplicity 2: check the invariant subspace
    rec = np.einsum("bik,bk,bjk->bij", np.asarray(v), np.asarray(w),
                    np.asarray(v))
    np.testing.assert_allclose(rec, np.asarray(d), atol=1e-13)
