"""Thick-restart Lanczos (TRLan, Wu & Simon) — bounded-memory eigensolving.

The plain k-step Lanczos of ``ops.lanczos`` stores a (k, N) basis; for
huge Hilbert spaces (sharded 2^N vectors) and hard spectra that is the
memory ceiling.  Thick restart keeps only an (k_window+1, N) window: after
each cycle the best ``l`` Ritz vectors are retained ("thickened") together
with the next Lanczos vector, the projected matrix restarts as an
arrowhead (diag(theta) bordered by the residual couplings s_i), and the
iteration continues — converging to the extremal eigenpairs with O(window)
memory.

No reference analogue (the reference's Lanczos is single-shot); this is
the production-scale forward engine, and its per-cycle state
``RestartState`` is an ordinary pytree — checkpoint it with
``utils.checkpoint`` and resume deterministically.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from .lanczos import _breakdown_rel_tol, _mm
from .operators import as_operator, hdot, pivot_gauge


class RestartState(NamedTuple):
    """Pytree state between thick-restart cycles (checkpointable).

    theta : (l,)    retained Ritz values
    y     : (l, N)  retained Ritz vectors (rows)
    s     : (l,)    residual couplings beta_k * (last eigvec components)
    q     : (N,)    next Lanczos vector
    """

    theta: jax.Array
    y: jax.Array
    s: jax.Array
    q: jax.Array


def _cycle(op, state: RestartState, k: int, extreme: str,
           reorth_passes: int):
    """One thick-restart cycle: continue Lanczos from the arrowhead.

    Breakdown-safe like :func:`~.lanczos.lanczos_step` — and it must be
    MORE careful than the single-shot engine: a cycle can exhaust the
    space many steps before its window ends (k close to op.dim, or a
    late cycle on a small problem).  Normalizing the ~0 residual there
    yields a vector that is NOT orthogonal to the basis, and the block
    reorthogonalization against a non-orthonormal basis is no longer a
    contraction — the recurrence then amplifies exponentially (observed:
    Ritz values at 1e126 within three cycles; round-4 review).  So on
    breakdown the recurrence restarts with a fresh orthonormalized
    vector (beta coupling zeroed); if even that has no orthogonal
    complement left (space exhausted) the remaining steps go DEAD: zero
    vectors, zero couplings, and their spurious t-diagonal entries are
    pushed past the requested spectral end so Ritz extraction never
    selects them.

    Implementation note (round-5 profiling at N = 2^27): the cycle is a
    PYTHON-UNROLLED loop over a LIST of row vectors, not a ``lax.scan``
    over an (k+1, N) slab.  A dynamic row update of a slab carried
    through scan makes XLA COPY the whole buffer every step (measured
    28.5 ms/step for a trivial body at 2^27 — the copy alone was ~a
    third of the restart tier's wall time), and the slab projection
    reads the full window including its not-yet-written zero rows.  The
    row list pays neither: no carry copy, and reorthogonalization
    traffic is triangular (only written rows are read).  Restart
    windows are small (k ≲ 32), so the unrolled trace stays cheap; the
    big-k single-shot engine keeps its scan (its slab is tiny relative
    to these N).
    """
    l = state.theta.shape[0]
    n, dtype = op.dim, state.q.dtype
    real_dtype = jnp.finfo(dtype).dtype
    rtol = _breakdown_rel_tol(real_dtype)
    tiny = jnp.finfo(real_dtype).tiny
    key = jax.random.PRNGKey(0x5452)  # deterministic restart stream

    # The window as a PYTHON LIST of (n,) rows (see the docstring's
    # implementation note): rows[j] is basis row j.
    rows = [state.y[i] for i in range(l)] + [state.q]

    t = jnp.zeros((k, k), dtype=real_dtype)
    t = t.at[jnp.arange(l), jnp.arange(l)].set(state.theta)
    t = t.at[l, :l].set(state.s).at[:l, l].set(state.s)

    # A dead continuation vector from the previous cycle (space was
    # exhausted there) keeps the whole cycle dead — resurrecting it with
    # a fresh random vector would re-derive eigenvalues already retained
    # in theta, and the duplicate Ritz vectors would destroy the next
    # cycle's basis orthonormality.
    dead0 = jnp.linalg.norm(state.q) < 0.5

    def project_rows(w):
        """w - sum_j rows[j] <rows[j], w> — the copy-free triangular
        projection: coefficients in one fused sweep, then one fused
        multiply-add chain; HIGHEST-effective precision (plain f32
        dots/axpys, no bf16 matmul pass involved)."""
        cs = [hdot(r, w) for r in rows]
        acc = rows[0] * cs[0]
        for r, c in zip(rows[1:], cs[1:]):
            acc = acc + r * c
        return w - acc

    def continuation(w, b, scale, dead_in, j):
        """(q_next, beta_out, row_dead, dead_out) after step ``j``.

        The restart path (fresh RNG vector + two full projections) sits
        under ``lax.cond`` so the common no-breakdown step never pays it
        — it used to run UNCONDITIONALLY every step, ~2/3 of the whole
        restart-tier wall time at N = 2^27.  Under plain jit only the
        taken branch executes; nothing in the restart tier is vmapped.
        """
        broke = b <= rtol * scale

        def mk_restart(_):
            r = jax.random.normal(jax.random.fold_in(key, j), (n,),
                                  dtype=dtype)
            r = r / jnp.linalg.norm(r)
            r = project_rows(r)
            r = project_rows(r)
            rn = jnp.linalg.norm(r).astype(real_dtype)
            exhausted = rn <= (jnp.sqrt(jnp.asarray(float(n), real_dtype))
                               * rtol)
            return r / jnp.maximum(rn, tiny).astype(dtype), exhausted

        def mk_advance(_):
            return (w / jnp.where(b > 0, b, 1.0),
                    jnp.zeros((), jnp.bool_))

        q_cand, exhausted = lax.cond(broke, mk_restart, mk_advance, None)
        dead_out = jnp.logical_or(dead_in,
                                  jnp.logical_and(broke, exhausted))
        q_next = jnp.where(dead_out, jnp.zeros_like(w), q_cand)
        beta_out = jnp.where(jnp.logical_or(broke, dead_out),
                             jnp.zeros_like(b), b)
        return q_next, beta_out, dead_in, dead_out

    # Step l (arrowhead column): w = A q - sum_i s_i y_i - alpha q.
    w = op.matvec(state.q)
    alpha = jnp.real(hdot(state.q, w)).astype(real_dtype)
    alpha = jnp.where(dead0, jnp.zeros_like(alpha), alpha)
    # HIGHEST-precision contraction (shared policy, operators.hmatmul):
    # reorthogonalizing at the TPU's default bf16 pass leaves ~4e-3
    # components along the basis and destroys the semi-orthogonality the
    # recurrence needs; restart_init pins _mm, the cycles must too.
    w = w - alpha * state.q - _mm(state.s.astype(dtype), state.y)
    for _ in range(reorth_passes):
        w = project_rows(w)
    beta = jnp.linalg.norm(w).astype(real_dtype)
    scale0 = jnp.abs(alpha) + jnp.linalg.norm(state.s) + 1.0
    q_next, beta, row_dead0, dead = continuation(w, beta, scale0, dead0, l)
    t = t.at[l, l].set(alpha)
    if l + 1 < k:
        t = t.at[l + 1, l].set(beta).at[l, l + 1].set(beta)
    rows.append(q_next)

    # Steps l+1 .. k-1: plain tridiagonal recurrence with full reorth,
    # PYTHON-UNROLLED (static j: t updates need no lax.cond, and the
    # window never rides a scan carry).
    q, q_prev, beta_prev = q_next, state.q, beta
    beta_last = beta
    row_dead_list = []
    for j in range(l + 1, k):
        w = op.matvec(q)
        a = jnp.real(hdot(q, w)).astype(real_dtype)
        a = jnp.where(dead, jnp.zeros_like(a), a)
        w = w - a * q - beta_prev * q_prev
        for _ in range(reorth_passes):
            w = project_rows(w)
        b = jnp.linalg.norm(w).astype(real_dtype)
        scale = jnp.sqrt(a * a + beta_prev * beta_prev) + 1.0
        qn, b_out, row_dead, dead = continuation(w, b, scale, dead, j)
        t = t.at[j, j].set(a)
        if j + 1 < k:
            t = t.at[j + 1, j].set(b_out).at[j, j + 1].set(b_out)
        rows.append(qn)
        row_dead_list.append(row_dead)
        q, q_prev, beta_prev = qn, q, b_out
        beta_last = b_out

    # Dead rows contributed alpha = 0 with zero couplings; shift those
    # spurious diagonal zeros PAST the requested spectral end (Gershgorin
    # bound of the genuine entries) so the ordered selection below can
    # never pick one over a genuine Ritz value.  t is block-diagonal
    # across the zeroed couplings, so the shift is exact.
    dead_mask = jnp.zeros((k,), bool)
    dead_mask = dead_mask.at[l].set(row_dead0)
    if row_dead_list:
        dead_mask = dead_mask.at[l + 1:].set(jnp.stack(row_dead_list))
    bound = jnp.sum(jnp.abs(t)) + 1.0
    shift = bound if extreme == "min" else -bound
    t = t + jnp.diag(jnp.where(dead_mask, shift, 0.0))

    evals, evecs = jnp.linalg.eigh(t)
    order = (jnp.arange(l + 1) if extreme == "min"
             else k - 1 - jnp.arange(l + 1))
    theta = evals[order]
    sel = evecs[:, order]                                     # (k, l+1)
    # Ritz recombination WITHOUT materializing a (k, N) stack (at
    # N = 2^27 the stack is another 8 GiB on top of the live rows —
    # OOM): one fused multiply-add chain over the rows per retained
    # vector, the same copy-free pattern as project_rows.
    sel_d = sel.astype(dtype)
    ys = []
    for i in range(l + 1):
        acc = rows[0] * sel_d[0, i]
        for j in range(1, k):
            acc = acc + rows[j] * sel_d[j, i]
        ys.append(acc)
    y = jnp.stack(ys)                                         # (l+1, N)
    s = (beta_last * sel[k - 1, :]).astype(real_dtype)
    return RestartState(theta=theta, y=y, s=s, q=rows[k])


def restart_init(op, k: int = 64, *, num_kept: int | None = None,
                 extreme: str = "min", v0=None, key=None,
                 reorth_passes: int = 2) -> RestartState:
    """Cycle 0 of thick-restart Lanczos: one plain k-step run compressed
    into a checkpointable :class:`RestartState`.

    Public so long runs can be driven CYCLE BY CYCLE from user code —
    ``state = restart_init(...)``, then repeatedly
    ``state, resid = restart_cycle(op, state, k)`` with
    ``utils.checkpoint.save_pytree`` between cycles, and
    :func:`restart_extract` at the end.  A killed run resumes from the
    last saved state deterministically (rehearsed end-to-end by
    ``tests/test_faulttolerance.py``, which SIGKILLs a worker mid-run).
    :func:`lanczos_restarted` is this loop fused under ``lax.scan``.
    """
    from .lanczos import lanczos  # cycle 0 = plain run

    op = as_operator(op)
    if extreme not in ("min", "max"):
        raise ValueError(f"extreme must be min|max, got {extreme!r}")
    n, dtype = op.dim, op.dtype
    k = int(min(k, n))
    # At least one Ritz vector must be retained: l = 0 (tiny clamped k
    # with the k//4 default, or an explicit num_kept=0) produces empty
    # theta/y/s arrays that crash restart_extract (round-4 review).
    l = int(max(1, k // 4) if num_kept is None else num_kept)
    if l < 1:
        raise ValueError(f"need num_kept >= 1, got {num_kept}")
    if l + 2 > k:
        raise ValueError(f"need k >= num_kept + 2, got k={k}, l={l}"
                         + (f" (k clamped to op.dim={n})" if k < 4 else ""))

    res = lanczos(op, k, v0=v0, key=key, reorth_passes=reorth_passes)
    # Work on the ROW-MAJOR (k, N) buffer: ``res.basis`` is its (N, k)
    # transposed VIEW, and using that view as a GEMM operand made XLA
    # materialize a full layout copy (8 GiB at N = 2^27); the double
    # transpose below folds away, so ``rows`` IS the scan buffer.
    rows = res.basis.T                                    # (k, N)
    t = jnp.diag(res.alphas)
    if res.betas.shape[0]:
        t = t + jnp.diag(res.betas, 1) + jnp.diag(res.betas, -1)
    evals, evecs = jnp.linalg.eigh(t)
    order = (jnp.arange(l) if extreme == "min" else k - 1 - jnp.arange(l))
    theta = evals[order]
    sel = evecs[:, order]
    y = _mm(sel.T.astype(dtype), rows)                    # (l, N)
    # The restart couplings s_i = beta_k <e_k, y_i> refer to the TRUE
    # continuation vector q_{k+1} of the Lanczos recurrence — reconstruct
    # it with one extra matvec (LanczosResult keeps only k vectors):
    #   w = A q_k - alpha_k q_k - beta_{k-1} q_{k-1};  q_{k+1} = w/||w||.
    qk = rows[-1]
    w = op.matvec(qk) - (res.alphas[-1] * qk).astype(dtype)
    if res.betas.shape[0]:
        w = w - res.betas[-1] * rows[-2]
    w = w - _mm(rows.T, _mm(rows.conj(), w))
    w = w - _mm(rows.T, _mm(rows.conj(), w))
    real_dtype = jnp.finfo(dtype).dtype
    beta_last = jnp.linalg.norm(w).astype(real_dtype)
    # Breakdown-safe continuation (same hazard as _cycle: normalizing a
    # ~0 residual yields a non-orthogonal junk vector whose reorth
    # projector amplifies later cycles exponentially).  On breakdown the
    # coupling s is zero by construction; continue from a fresh
    # orthonormalized vector, or a DEAD zero vector when the k-step run
    # already spanned the whole space.
    rtol = _breakdown_rel_tol(real_dtype)
    last_beta = (res.betas[-1] if res.betas.shape[0]
                 else jnp.zeros((), real_dtype))
    broke = beta_last <= rtol * (jnp.abs(res.alphas[-1])
                                 + jnp.abs(last_beta) + 1.0)
    r = jax.random.normal(jax.random.PRNGKey(0x5452), (n,), dtype=dtype)
    r = r / jnp.linalg.norm(r)
    r = r - _mm(rows.T, _mm(rows.conj(), r))
    r = r - _mm(rows.T, _mm(rows.conj(), r))
    rn = jnp.linalg.norm(r).astype(real_dtype)
    exhausted = rn <= jnp.sqrt(jnp.asarray(float(n), real_dtype)) * rtol
    dead = jnp.logical_and(broke, exhausted)
    tiny = jnp.finfo(real_dtype).tiny
    q = jnp.where(
        dead, jnp.zeros_like(w),
        jnp.where(broke, r / jnp.maximum(rn, tiny).astype(dtype),
                  w / jnp.where(beta_last > 0, beta_last, 1.0)))
    s = jnp.where(broke, 0.0, beta_last) * sel[k - 1, :]
    return RestartState(theta=theta, y=y, s=jnp.real(s), q=q)


def restart_cycle(op, state: RestartState, k: int, *,
                  extreme: str = "min", reorth_passes: int = 2):
    """One thick-restart cycle on a :class:`RestartState`.

    Returns ``(state, residual)`` — the state trimmed back to the
    retained count (ready for the next cycle or a checkpoint) and the
    extremal pair's residual-coupling magnitude ``|s_0|``.
    """
    op = as_operator(op)
    l = state.theta.shape[0]
    # Same clamp as restart_init/lanczos_restarted: without it the
    # documented cycle-by-cycle driving pattern (restart_init clamps its
    # own k, the user passes the ORIGINAL k here) builds a basis wider
    # than the space — rows beyond op.dim stay ~0 and eigh(t) yields
    # spurious ~0 Ritz values that "converge" silently.
    k = int(min(k, op.dim))
    if l + 2 > k:
        raise ValueError(
            f"need k >= num_kept + 2, got k={k} (clamped to op.dim="
            f"{op.dim}) with {l} retained Ritz vectors")
    new = _cycle(op, state, k, extreme, int(reorth_passes))
    trimmed = RestartState(theta=new.theta[:l], y=new.y[:l],
                           s=new.s[:l], q=new.q)
    return trimmed, jnp.abs(new.s[0])


def restart_extract(state: RestartState):
    """Finalize a restart run: ``(lam, v, residual)`` of the extremal
    Ritz pair, normalized and phase-gauged like every forward here."""
    lam = state.theta[0]
    v = state.y[0]
    v = pivot_gauge(v / jnp.linalg.norm(v))
    return lam, v, jnp.abs(state.s[0])


def lanczos_restarted(op, k: int = 64, *, n_restarts: int = 8,
                      num_kept: int | None = None, extreme: str = "min",
                      v0=None, key=None, reorth_passes: int = 2):
    """Extremal eigenpair via thick-restart Lanczos with an (k+1, N)-window.

    Parameters
    ----------
    op         : symmetric/Hermitian LinearOperator (or dense matrix).
    k          : Lanczos window size per cycle.
    n_restarts : number of restart cycles after the initial one.
    num_kept   : Ritz vectors retained per restart (default k//4; the
                 retained count grows by one internally for the residual
                 coupling).
    extreme    : "min" or "max".

    Returns ``(lam, v, residual)``: the converged extremal Ritz pair and
    its residual norm estimate ``|s_0|``.  For checkpointed cycle-by-
    cycle driving, use :func:`restart_init` / :func:`restart_cycle` /
    :func:`restart_extract` — this function is the same loop fused under
    ``lax.scan``.

    .. note:: **TPU memory at extreme N.**  Pick ``k + 1`` a multiple
       of 8: the window's (k+1, N) buffer is tiled T(8, 128), so a
       17-row window allocates 24 rows (1.4×, +3.5 GiB at N = 2^27).
       And when one cycle's window is most of HBM, drive the cycles
       from Python with the state donated between jitted calls
       (``jax.jit(partial(restart_cycle, op, k=k), donate_argnums=(0,))``
       — see ``benchmarks/restart_bench.py --stepped``, which runs the
       134M-dim TFIM point on a 16 GiB chip this way) instead of this
       fused scan, whose carried window XLA double-buffers.
    """
    op = as_operator(op)
    k = int(min(k, op.dim))
    state = restart_init(op, k, num_kept=num_kept, extreme=extreme,
                         v0=v0, key=key, reorth_passes=reorth_passes)

    def body(state, _):
        return restart_cycle(op, state, k, extreme=extreme,
                             reorth_passes=reorth_passes)

    state, _ = lax.scan(body, state, None, length=n_restarts)
    return restart_extract(state)
