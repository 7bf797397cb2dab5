"""Linear operators as JAX pytrees.

The PyTorch reference (``DominantSparseEigenAD``) passes matrices either as
dense ``torch.Tensor``s or injects matrix-free matvec closures through
module-level setter functions (``setDominantSparseSymeig`` et al., cf.
reference ``symeig.py`` / ``eig.py``), because ``torch.autograd.Function.apply``
cannot take callables as differentiable arguments.

JAX has no such restriction: closures are trace-able and pytrees carry the
differentiable parameters.  So in this framework an *operator is a pytree*:

* its array leaves (dense matrix, sparse values, physical couplings like the
  TFIM field ``g``) are differentiable inputs that flow through
  ``jax.jvp`` / ``jax.grad`` like any other argument;
* its static structure (the matvec code, dimensions, dtype) lives in the
  pytree treedef.

Every operator implements:

* ``matvec(x)``   — ``A @ x``  (the hot loop; must be jit/scan friendly)
* ``rmatvec(x)``  — ``A.T @ x`` (needed by the non-symmetric eigensolver)
* ``dim``         — the (square) dimension N
* ``dtype``

Reference parity: this module replaces the implicit operator handling in
``Lanczos.py`` (dense tensor or ``sparse=True`` + closure) and the
``set*``-style global state of ``symeig.py``/``eig.py`` with first-class
values.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp


def hmatmul(a, b):
    """``jnp.matmul`` at HIGHEST precision — one shared definition of the
    precision policy (see :func:`hdot`); imported as ``_mm`` by the
    solver modules for their orthogonalization/Ritz-projection GEMMs."""
    return jnp.matmul(a, b, precision=jax.lax.Precision.HIGHEST)


def hdot(a, b):
    """``jnp.vdot`` at HIGHEST precision.

    The TPU's default dot/matmul precision is bf16 passthrough (~2^-8
    relative error).  Library-internal reductions — Lanczos tridiagonal
    coefficients, CG step sizes, Rayleigh quotients, IFT tangent
    contractions — directly set eigenvalue/gradient digits, so they pin
    full-f32 accumulation (measured: TFIM N=16 E0 relative error 2e-5 ->
    1e-6 at <2% wall time; these are bandwidth-bound ops).  Operator
    applications (matvec/matmat) are never wrapped: their precision is
    the caller's choice.
    """
    return jnp.vdot(a, b, precision=jax.lax.Precision.HIGHEST)


def pivot_gauge(v, *companions):
    """Deterministic pivot-phase gauge: scale each eigenvector column
    (axis 0; or a single (N,) vector) so its largest-magnitude entry is
    real positive.  ONE definition shared by every forward engine
    (Lanczos block solvers, LOBPCG, spectrum slicing) — the IFT tangent
    rules' ``_pivot_phase_project`` assumes exactly this gauge, so
    drifting per-module copies would silently desynchronize a forward
    from its own derivative rule.  Real dtypes: fixes the sign.

    ``companions`` (e.g. a tracked ``A @ v`` image) get the same phase;
    with companions the return is a tuple ``(v', *companions')``."""
    if v.ndim == 1:
        phase = jnp.conj(jnp.sign(v[jnp.argmax(jnp.abs(v))]))
    else:
        idx = jnp.argmax(jnp.abs(v), axis=0)
        pivots = jnp.take_along_axis(v, idx[None], axis=0)[0]
        phase = jnp.conj(jnp.sign(pivots))[None, :]
    out = (v * phase,) + tuple(c * phase for c in companions)
    return out if companions else out[0]


def tol_floor(tol: float, dtype) -> float:
    """Clamp a relative tolerance to what ``dtype`` can actually resolve.

    Residuals of a converged iteration bottom out near machine epsilon of
    the *real* working dtype; a tighter request (e.g. the f64-appropriate
    defaults on an f32/TPU run) would make residual-stopped loops burn
    their full budget and convergence checks report failure on fully
    converged results.  50x eps is a conservative floor (~6e-6 in f32,
    ~1.1e-14 in f64) that leaves the f64 defaults untouched.
    """
    eps = float(jnp.finfo(jnp.finfo(dtype).dtype).eps)
    return max(float(tol), 50.0 * eps)


class LinearOperator:
    """Abstract square linear operator.

    Subclasses must be registered as pytrees and implement :meth:`matvec`.
    """

    # -- required interface -------------------------------------------------
    def matvec(self, x: jax.Array) -> jax.Array:
        raise NotImplementedError

    def rmatvec(self, x: jax.Array) -> jax.Array:
        """Transpose matvec ``A.T @ x``.  Symmetric operators inherit this."""
        raise NotImplementedError

    @property
    def dim(self) -> int:
        raise NotImplementedError

    @property
    def dtype(self):
        raise NotImplementedError

    # -- conveniences --------------------------------------------------------
    @property
    def shape(self) -> tuple[int, int]:
        return (self.dim, self.dim)

    def matmat(self, X: jax.Array) -> jax.Array:
        """``A @ X`` for an (N, m) block of vectors; default vmaps matvec."""
        return jax.vmap(self.matvec, in_axes=1, out_axes=1)(X)

    def rmatmat(self, X: jax.Array) -> jax.Array:
        return jax.vmap(self.rmatvec, in_axes=1, out_axes=1)(X)

    def to_dense(self) -> jax.Array:
        """Materialize as a dense (N, N) matrix — test/debug helper only."""
        return self.matmat(jnp.eye(self.dim, dtype=self.dtype))

    def __matmul__(self, x):
        if isinstance(x, LinearOperator):
            return ComposedOperator(self, x)
        if x.ndim == 1:
            return self.matvec(x)
        return self.matmat(x)

    # transpose view
    @property
    def T(self) -> "TransposedOperator":
        return TransposedOperator(self)

    # -- operator algebra (scipy.sparse.linalg-style conveniences) ----------
    def __add__(self, other):
        if isinstance(other, LinearOperator):
            return SumOperator(self, other)
        return NotImplemented

    def __mul__(self, scalar):
        return ScaledOperator(self, scalar)

    __rmul__ = __mul__

    def __sub__(self, other):
        if isinstance(other, LinearOperator):
            return SumOperator(self, ScaledOperator(other, -1.0))
        return NotImplemented

    def __neg__(self):
        return ScaledOperator(self, -1.0)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class DenseOperator(LinearOperator):
    """Dense square matrix operator.

    Equivalent of passing a dense ``torch.Tensor`` to the reference's
    ``symeigLanczos`` (reference ``Lanczos.py``: the ``sparse=False`` path).
    """

    a: jax.Array

    # Applications are pinned to HIGHEST precision: f32-stored entries
    # get genuine f32 math (the BellOperator tier makes the same call —
    # narrow storage is the explicit opt-in for narrow math).  The TPU
    # default is otherwise INCONSISTENT between the paths: chip-measured,
    # a (n,n)@(n,) matvec already runs full f32 but the same operator's
    # (n,n)@(n,r) matmat drops to one bf16 pass (2.5e-3 relative error),
    # which silently cost the block solvers (LOBPCG/dominant_eigh_multi)
    # two digits while the vector solvers stayed accurate.

    def matvec(self, x):
        return hmatmul(self.a, x)

    def rmatvec(self, x):
        return hmatmul(self.a.T, x)

    def matmat(self, X):
        return hmatmul(self.a, X)

    def rmatmat(self, X):
        return hmatmul(self.a.T, X)

    def to_dense(self):
        return self.a

    @property
    def dim(self):
        return self.a.shape[0]

    @property
    def dtype(self):
        return self.a.dtype

    def tree_flatten(self):
        return (self.a,), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class TransposedOperator(LinearOperator):
    """Lazy transpose view of another operator."""

    op: LinearOperator

    def matvec(self, x):
        return self.op.rmatvec(x)

    def rmatvec(self, x):
        return self.op.matvec(x)

    def matmat(self, X):
        return self.op.rmatmat(X)

    def rmatmat(self, X):
        return self.op.matmat(X)

    @property
    def dim(self):
        return self.op.dim

    @property
    def dtype(self):
        return self.op.dtype

    def tree_flatten(self):
        return (self.op,), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


@jax.tree_util.register_pytree_node_class
class MatrixFreeOperator(LinearOperator):
    """Matrix-free operator ``A(params) @ x = matvec_fn(params, x)``.

    TPU-native replacement for the reference's matvec-closure path
    (``symeigLanczos(..., sparse=True, dim=N)`` + ``setDominantSparseSymeig``):
    ``params`` is a differentiable pytree leaf-set (e.g. the TFIM transverse
    field ``g``), ``matvec_fn`` is static code.  Gradients w.r.t. ``params``
    flow through ``jax.jvp(lambda p: matvec_fn(p, x), ...)`` — the lazy
    "adjoint contraction" ``u^T (dA/dθ) w`` of the reference
    (``Aadjoint_to_gadjoint``) falls out of AD automatically, and the N×N
    adjoint matrix is never materialized.

    Parameters
    ----------
    matvec_fn : callable ``(params, x) -> A x``; must be jit-traceable.
    params    : differentiable pytree.
    dim       : operator dimension N (static).
    dtype     : element dtype (static).
    rmatvec_fn: optional ``(params, x) -> A^T x``; defaults to ``matvec_fn``
                (i.e. assumes symmetric) unless provided.
    symmetric : declare symmetry (enables rmatvec = matvec default).
    """

    def __init__(self, matvec_fn, params, dim, dtype=jnp.float32,
                 rmatvec_fn=None, symmetric=True):
        if rmatvec_fn is None and not symmetric:
            raise ValueError(
                "non-symmetric MatrixFreeOperator requires rmatvec_fn")
        self.matvec_fn = matvec_fn
        self.params = params
        self._dim = int(dim)
        self._dtype = jnp.dtype(dtype)
        self.rmatvec_fn = rmatvec_fn
        self.symmetric = bool(symmetric)

    def matvec(self, x):
        return self.matvec_fn(self.params, x)

    def rmatvec(self, x):
        if self.rmatvec_fn is not None:
            return self.rmatvec_fn(self.params, x)
        return self.matvec_fn(self.params, x)

    @property
    def dim(self):
        return self._dim

    @property
    def dtype(self):
        return self._dtype

    def tree_flatten(self):
        aux = (self.matvec_fn, self._dim, self._dtype, self.rmatvec_fn,
               self.symmetric)
        return (self.params,), aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        matvec_fn, dim, dtype, rmatvec_fn, symmetric = aux
        obj = cls.__new__(cls)
        obj.matvec_fn = matvec_fn
        obj.params = children[0]
        obj._dim = dim
        obj._dtype = dtype
        obj.rmatvec_fn = rmatvec_fn
        obj.symmetric = symmetric
        return obj


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class ShiftedOperator(LinearOperator):
    """``A - shift * I`` — the resolvent-style operator of the IFT backward.

    The reference builds ``A - λI`` implicitly inside its deflated CG
    (reference ``CG.py``); here it is an explicit composable value.
    """

    op: LinearOperator
    shift: jax.Array

    def matvec(self, x):
        return self.op.matvec(x) - self.shift * x

    def rmatvec(self, x):
        return self.op.rmatvec(x) - self.shift * x

    @property
    def dim(self):
        return self.op.dim

    @property
    def dtype(self):
        return self.op.dtype

    def tree_flatten(self):
        return (self.op, self.shift), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class DeflatedOperator(LinearOperator):
    """``P (A) P`` with ``P = I - V V^T`` (V: (N, r) orthonormal columns).

    Restriction of ``A`` to the orthogonal complement of ``span(V)`` — the
    operator the IFT backward solves against (reference ``CG.py``:
    ``(I - v v^T)(A - λI)(I - v v^T)``).  Supports rank-r deflation to handle
    clustered/degenerate eigenvalues (reference only deflates rank 1).
    """

    op: LinearOperator
    V: jax.Array  # (N, r) or (N,) orthonormal

    def _project(self, x):
        V = self.V if self.V.ndim == 2 else self.V[:, None]
        return x - hmatmul(V, hmatmul(V.conj().T, x))

    def matvec(self, x):
        return self._project(self.op.matvec(self._project(x)))

    def rmatvec(self, x):
        return self._project(self.op.rmatvec(self._project(x)))

    @property
    def dim(self):
        return self.op.dim

    @property
    def dtype(self):
        return self.op.dtype

    def tree_flatten(self):
        return (self.op, self.V), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class SumOperator(LinearOperator):
    """``A + B`` of two conforming operators (lazy)."""

    a: LinearOperator
    b: LinearOperator

    def matvec(self, x):
        return self.a.matvec(x) + self.b.matvec(x)

    def rmatvec(self, x):
        return self.a.rmatvec(x) + self.b.rmatvec(x)

    @property
    def dim(self):
        return self.a.dim

    @property
    def dtype(self):
        return self.a.dtype

    def tree_flatten(self):
        return (self.a, self.b), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class ScaledOperator(LinearOperator):
    """``c * A`` with a (possibly traced, differentiable) scalar ``c``."""

    op: LinearOperator
    c: Any

    def matvec(self, x):
        return self.c * self.op.matvec(x)

    def rmatvec(self, x):
        return self.c * self.op.rmatvec(x)

    @property
    def dim(self):
        return self.op.dim

    @property
    def dtype(self):
        return self.op.dtype

    def tree_flatten(self):
        return (self.op, self.c), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class ComposedOperator(LinearOperator):
    """``A @ B`` composition (lazy)."""

    a: LinearOperator
    b: LinearOperator

    def matvec(self, x):
        return self.a.matvec(self.b.matvec(x))

    def rmatvec(self, x):
        return self.b.rmatvec(self.a.rmatvec(x))

    @property
    def dim(self):
        return self.a.dim

    @property
    def dtype(self):
        return self.a.dtype

    def tree_flatten(self):
        return (self.a, self.b), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def as_operator(a: Any) -> LinearOperator:
    """Coerce a dense array / operator into a LinearOperator."""
    if isinstance(a, LinearOperator):
        return a
    a = jnp.asarray(a)
    if a.ndim != 2 or a.shape[0] != a.shape[1]:
        raise ValueError(f"expected square matrix, got shape {a.shape}")
    return DenseOperator(a)
