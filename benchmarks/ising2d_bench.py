"""2D Ising TRG head-to-head — BASELINE config #4.

Times free energy + d(lnZ)/dbeta (energy) through the TRG flow:

* ours: this framework's `trg_free_energy` under `jax.jit` — **on the
  real TPU chip in f32 by default** (the scan-phase flow compiles in
  ~10 s there; the growth-phase matmuls run at HIGHEST precision so f32
  matches f64 to ~1e-5), falling back to CPU f64 if the device is
  unreachable;
* baseline: the reference's approach in eager torch — the same Levin-Nave
  TRG with `torch.linalg.svd` splits, differentiated by torch autograd
  through the whole flow (reference `examples/CTMRG`-style; written
  fresh), f64 CPU.

Accuracy asserted against the Onsager integral for both.  Prints one
JSON line like bench.py.

Run: python benchmarks/ising2d_bench.py --chi 30 --steps 20
The jax stage runs in a subprocess so a wedged TPU tunnel cannot hang
the bench: --platform {auto,tpu,cpu} (auto = try TPU, fall back).
"""

import argparse
import json
import os
import subprocess
import sys
import time

# Runnable from a source checkout without installation: put the repo
# root ahead of the script dir on sys.path.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CHI = 30
STEPS = 20
BETA = 0.5
METHOD = "trg"

TPU_STAGE_TIMEOUT = 420  # generous: ~15 s compile + tunnel round-trips


def run_ours_stage(platform):
    """Executed in a subprocess: one platform, prints one JSON line."""
    import jax

    if platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    from dominantsparseeigenad_tpu.models import (ctmrg_free_energy,
                                                  trg_free_energy)

    contract = trg_free_energy if METHOD == "trg" else ctmrg_free_energy
    on_tpu = jax.devices()[0].platform != "cpu"
    if platform == "tpu" and not on_tpu:
        # The plugin fell back to the CPU backend: without x64 enabled
        # this stage would silently run f32 mislabeled as the CPU-f64
        # fallback (and with chi=30 the f32+gram split reconstructs
        # noise).  Fail the stage so the parent tries "cpu" properly.
        print("tpu stage resolved to CPU backend; deferring to the cpu "
              "stage", file=sys.stderr)
        sys.exit(3)
    dtype = jnp.float32 if on_tpu else jnp.float64

    def lnz_and_grad(b):
        # Forward-mode: scalar->scalar, and it avoids transposing the
        # scanned flow (see models/ising2d.py on nested custom_jvp rules).
        f = lambda bb: contract(bb, chi=CHI, n_steps=STEPS, dtype=dtype)
        val, d1 = jax.jvp(f, (b,), (jnp.ones_like(b),))
        return jnp.stack([val, d1])

    fj = jax.jit(lnz_and_grad)
    import numpy as np

    out = np.asarray(fj(jnp.asarray(BETA, dtype)))  # warm (compile)
    ts = []
    for i in range(5):
        b = jnp.asarray(BETA + i * 1e-6, dtype)
        t0 = time.perf_counter()
        out = np.asarray(fj(b))  # host transfer = true device sync
        ts.append(time.perf_counter() - t0)
    print(json.dumps({
        "t": min(ts), "lnz": float(out[0]), "g": float(out[1]),
        "platform": "tpu" if on_tpu else "cpu",
    }))


def bench_ours(platform):
    """Run the jax stage in a subprocess; returns (t, lnz, g, platform)."""
    tries = ["tpu", "cpu"] if platform == "auto" else [platform]
    last_err = None
    for p in tries:
        stage_timeout = TPU_STAGE_TIMEOUT if p == "tpu" else 600
        try:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--_stage", "ours", "--platform", p, "--method", METHOD,
                 "--chi", str(CHI), "--steps", str(STEPS)],
                capture_output=True, text=True, timeout=stage_timeout,
            )
            if r.returncode == 0:
                rec = json.loads(r.stdout.strip().splitlines()[-1])
                return rec["t"], rec["lnz"], rec["g"], rec["platform"]
            last_err = r.stderr[-500:]
        except subprocess.TimeoutExpired:
            last_err = f"{p} stage timed out ({stage_timeout}s)"
        except (json.JSONDecodeError, IndexError, KeyError) as e:
            # Zero-exit stage with unparseable stdout must degrade to the
            # next platform, not kill the fallback chain.
            last_err = f"{p} stage output unparseable: {e}"
        print(f"# ours[{p}] failed: {last_err}", file=sys.stderr)
    raise RuntimeError(f"all platforms failed: {last_err}")


def bench_torch():
    import torch

    # Pin the thread pool (same as bench.py's headline baseline): an
    # unpinned eager-torch denominator swings several-fold with host
    # load, making the reported ratios unstable across driver runs.
    torch.set_num_threads(min(4, os.cpu_count() or 4))

    dtype = torch.float64

    def vertex(beta):
        cp = torch.sqrt(torch.cosh(beta))
        sm = torch.sqrt(torch.sinh(beta))
        w = torch.stack([
            torch.stack([cp + sm, cp - sm]),
            torch.stack([cp - sm, cp + sm]),
        ]) / torch.sqrt(torch.tensor(2.0, dtype=dtype))
        return torch.einsum("su,sr,sd,sl->urdl", w, w, w, w)

    def split(m, chi):
        u, s, vh = torch.linalg.svd(m, full_matrices=False)
        sq = torch.sqrt(s[:chi])
        return u[:, :chi] * sq[None, :], vh[:chi].t() * sq[None, :]

    def trg_lnz(beta):
        t = vertex(beta)
        logz = torch.zeros((), dtype=dtype)
        for i in range(STEPS):
            norm = t.abs().max()
            t = t / norm
            logz = logz + torch.log(norm) / (2 ** i)
            d = t.shape[0]
            chi_eff = min(CHI, d * d)
            ma = t.reshape(d * d, d * d)
            mb = t.permute(3, 0, 1, 2).reshape(d * d, d * d)
            f1, f2 = split(ma, chi_eff)
            f3, f4 = split(mb, chi_eff)
            f1 = f1.reshape(d, d, -1)
            f2 = f2.reshape(d, d, -1)
            f3 = f3.reshape(d, d, -1)
            f4 = f4.reshape(d, d, -1)
            t = torch.einsum("wxa,xyb,yzc,zwd->cbad", f1, f3, f2, f4)
        norm = t.abs().max()
        t = t / norm
        logz = logz + torch.log(norm) / (2 ** STEPS)
        return logz + torch.log(torch.einsum("urur->", t)) / (2 ** STEPS)

    def value_and_grad(beta_val):
        b = torch.tensor(beta_val, dtype=dtype, requires_grad=True)
        lnz = trg_lnz(b)
        (g,) = torch.autograd.grad(lnz, b)
        return float(lnz), float(g)

    out = value_and_grad(BETA)  # warmup
    ts = []
    for i in range(3):
        t0 = time.perf_counter()
        out = value_and_grad(BETA + i * 1e-7)
        ts.append(time.perf_counter() - t0)
    return min(ts), out[0], out[1]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chi", type=int, default=CHI)
    ap.add_argument("--steps", type=int, default=STEPS)
    ap.add_argument("--platform", default="auto",
                    choices=["auto", "tpu", "cpu"])
    ap.add_argument("--method", default="trg", choices=["trg", "ctmrg"],
                    help="contraction under test; ctmrg has no torch "
                         "baseline here (the torch TRG denominator would "
                         "be apples-to-oranges) and reports ours-only")
    ap.add_argument("--_stage", default=None, help=argparse.SUPPRESS)
    args = ap.parse_args()
    globals()["CHI"], globals()["STEPS"] = args.chi, args.steps
    globals()["METHOD"] = args.method

    if args._stage == "ours":
        run_ours_stage("cpu" if args.platform == "cpu" else "tpu")
        return

    import numpy as np
    if METHOD == "trg":
        t_ref, lnz_t, g_t = bench_torch()
    t_ours, lnz_j, g_j, plat = bench_ours(args.platform)

    # Onsager oracle (numpy copy of the quadrature).
    x, wq = np.polynomial.legendre.leggauss(128)
    tt = (x + 1.0) * np.pi
    wq = wq * np.pi
    c2, s2 = np.cosh(2 * BETA) ** 2, np.sinh(2 * BETA)
    exact = np.log(2.0) + np.einsum(
        "i,j,ij->", wq, wq,
        np.log(c2 - s2 * (np.cos(tt)[:, None] + np.cos(tt)[None, :]))
    ) / (8 * np.pi ** 2)

    if METHOD == "ctmrg":
        # CTMRG mode: ours-only artifact (chip test test_tpu.py::
        # test_ctmrg_free_energy_on_chip asserts the order-2 path; this
        # records the wall time against the same Onsager bar).
        print(f"# ours[{plat}] ctmrg {t_ours:.3f}s (lnZ {lnz_j:.6f}, "
              f"dlnZ {g_j:.4f})  onsager {exact:.6f}", file=sys.stderr)
        assert abs(lnz_j - exact) / abs(exact) < 1e-3
        assert np.isfinite(g_j), "our gradient must be finite"
        print(json.dumps({
            "metric": "ising2d_ctmrg_lnz_grad_time",
            "value": round(t_ours, 4),
            "unit": "s",
            "vs_baseline": None,
            "platform": plat,
        }))
        return

    print(f"# ours[{plat}] {t_ours:.3f}s (lnZ {lnz_j:.6f}, dlnZ {g_j:.4f})  "
          f"torch {t_ref:.3f}s (lnZ {lnz_t:.6f}, dlnZ {g_t:.4f})  "
          f"onsager {exact:.6f}", file=sys.stderr)
    assert abs(lnz_j - exact) / abs(exact) < 1e-3
    assert abs(lnz_t - exact) / abs(exact) < 1e-3
    assert np.isfinite(g_j), "our gradient must be finite"
    if not np.isfinite(g_t):
        # The reference approach (torch autograd through plain SVD) NaNs
        # on the degenerate singular clusters of this flow — the failure
        # the framework's broadened rules exist to fix.  Its time is then
        # not a time-to-solution at all.
        print("# baseline gradient is NaN (degenerate SVD backward) — "
              "reference cannot produce this result", file=sys.stderr)

    print(json.dumps({
        "metric": "ising2d_trg_lnz_grad_time",
        "value": round(t_ours, 4),
        "unit": "s",
        "vs_baseline": round(t_ref / t_ours, 2),
        "platform": plat,
        "baseline_grad_finite": bool(np.isfinite(g_t)),
    }))


if __name__ == "__main__":
    main()
