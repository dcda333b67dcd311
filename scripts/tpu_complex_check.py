"""Hardware proof of complex time evolution on the TPU (VERDICT rounds 2-3:
the reference's timestep stack is complex-native,
/root/reference/src/algorithms/timestep/, and the claim "TPU-native time
evolution" needs a chip artifact).

ROUND-4 FINDING: the axon TPU runtime implements NO complex dtype at all —
even ``jnp.zeros((4,), complex64)`` fails with UNIMPLEMENTED (the round-3
version of this script, which assumed c64 works on chip as it does on
stock TPU backends, could never have run here). The probe is recorded in
the artifact, and the proof instead runs the SPLIT-COMPLEX path
(tensors/splitc.py + algorithms/tdvp_split.py): complex tensors as real
f32 pairs, the same real-pair lowering XLA itself performs on TPU
backends that do support c64.

ON THE CHIP this script runs:
  1. the c64 probe (subprocess, so the failed trace cannot poison the
     main client) — records the UNIMPLEMENTED error string;
  2. a split-complex TDVP quench on the finite TFIM (L=32, D=256 f32
     pairs): ground state at g=1.5 (f32 DMRG), quench to g=0.5, 3 TDVP
     steps of dt=0.05; asserts the energy drift stays at the f32 floor
     and the energies match a CPU complex128 reference trajectory run by
     a concurrent subprocess (the complex-NATIVE code path, so the two
     implementations cross-check each other).

Writes TPU_COMPLEX_r04.json at the repo root. Run alone (no concurrent
TPU processes); takes ~10-15 min (remote compiles + the CPU reference).
"""
import json
import subprocess
import sys
import time
import pathlib

ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

import jax
import jax.numpy as jnp
import numpy as np

L, D, G0, G1 = 32, 256, 1.5, 0.5
DT, NSTEP = 0.05, 3
M_KRYLOV = 20

PROBE_CODE = """
import jax, jax.numpy as jnp, json
# NOTE: constant inputs (zeros/ones) are folded at trace time and
# falsely report OK on a backend with no complex support — every probe
# must flow DEVICE-RANDOM data through the op and read the result back.
k = jax.random.PRNGKey(0)
a = jax.random.normal(k, (8, 8))
out = {}
for name, fn in [
    ("cast_c64", lambda: (a.astype(jnp.complex64) * 1j).sum()),
    ("matmul_c64", lambda: jax.jit(lambda x: (x + 1j * x) @ (x - 1j * x))(a)),
    ("fft_c64", lambda: jnp.fft.fft(a[0])),
]:
    try:
        r = fn()
        float(abs(jnp.asarray(r).ravel()[0]))  # force host readback
        out[name] = "OK"
    except Exception as e:
        out[name] = type(e).__name__ + ": " + str(e).splitlines()[0][:140]
print("PROBE " + json.dumps(out))
"""

CPU_REF_CODE = f"""
import sys; sys.path.insert(0, {str(ROOT)!r})
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp, numpy as np, json
from mpskit_tpu.models.hamiltonians import transverse_field_ising_lattice
from mpskit_tpu.states import FiniteMPS
from mpskit_tpu.algorithms.dmrg import DMRG, find_groundstate_dmrg
from mpskit_tpu.algorithms.tdvp import TDVP, timestep
from mpskit_tpu.algorithms.expval import expectation_value

H0 = transverse_field_ising_lattice(g={G0}, dtype=np.float64)
H1 = transverse_field_ising_lattice(g={G1}, dtype=np.float64)
psi = FiniteMPS.random(jax.random.PRNGKey(0), {L}, 2, {D}, dtype=jnp.float64)
psi, _, _ = find_groundstate_dmrg(psi, H0, DMRG(tol=1e-8, maxiter=12))
psi = FiniteMPS(psi.ALs.astype(jnp.complex128), psi.ARs.astype(jnp.complex128),
                psi.AC.astype(jnp.complex128), psi.center)
es = [float(jnp.real(expectation_value(psi, H1)))]
t = 0.0
for _ in range({NSTEP}):
    psi, _ = timestep(psi, H1, t, {DT}, TDVP())
    t += {DT}
    es.append(float(jnp.real(expectation_value(psi, H1))))
print("CPUREF " + json.dumps(es))
"""


def main():
    from mpskit_tpu.models.hamiltonians import transverse_field_ising_lattice
    from mpskit_tpu.states import FiniteMPS
    from mpskit_tpu.algorithms.dmrg import DMRG, find_groundstate_dmrg
    from mpskit_tpu.algorithms.tdvp_split import (
        timestep_split, expectation_value_split, compute_right_envs_split,
    )
    from mpskit_tpu.environments.finite import stack_W, right_boundary
    from mpskit_tpu.states.finitemps import support_mask
    from mpskit_tpu.tensors.splitc import sc
    from mpskit_tpu.config import matmul_precision

    out = {"platform": str(jax.devices()[0]),
           "representation": "split-complex f32 pairs (tensors/splitc.py)"}

    # ---- 0. the c64 probe, in its own process ---------------------------
    probe = subprocess.run([sys.executable, "-c", PROBE_CODE],
                           capture_output=True, text=True, timeout=900)
    for line in probe.stdout.splitlines():
        if line.startswith("PROBE "):
            out["c64_backend_probe"] = json.loads(line[len("PROBE "):])
    print("c64 probe:", out.get("c64_backend_probe"), flush=True)

    # launch the CPU c128 reference concurrently (CPU-only subprocess)
    cpu_proc = subprocess.Popen([sys.executable, "-c", CPU_REF_CODE],
                                stdout=subprocess.PIPE,
                                stderr=subprocess.DEVNULL, text=True)

    # ---- 1. split-complex TDVP quench on the chip ------------------------
    H0 = transverse_field_ising_lattice(g=G0, dtype=np.float64)
    H1 = transverse_field_ising_lattice(g=G1, dtype=np.float64)
    with matmul_precision(jnp.float32):
        psi = FiniteMPS.random(jax.random.PRNGKey(0), L, 2, D,
                               dtype=jnp.float32)
        psi, _, _ = find_groundstate_dmrg(psi, H0, DMRG(tol=1e-8, maxiter=12))
        psi = psi.move_center(0)
        state = (jnp.stack([psi.ALs, jnp.zeros_like(psi.ALs)], axis=0),
                 jnp.stack([psi.ARs, jnp.zeros_like(psi.ARs)], axis=0),
                 sc(psi.AC))
        Ws = stack_W(H1, L).astype(jnp.float32)
        GRs = compute_right_envs_split(
            state[1], Ws, sc(right_boundary(Ws.shape[1], D, jnp.float32)))
        es = [float(expectation_value_split(state[2], Ws, GRs))]
        masks = jnp.asarray(support_mask(L, 2, D))
        t0 = time.perf_counter()
        errs = []
        for _ in range(NSTEP):
            state, GRs, err = timestep_split(state, H1, DT, m=M_KRYLOV,
                                             masks=masks)
            es.append(float(expectation_value_split(state[2], Ws, GRs)))
            errs.append(float(err))
        wall = time.perf_counter() - t0
    drift = max(abs(e - es[0]) for e in es[1:]) / abs(es[0])
    norm_err = abs(float(jnp.linalg.norm(state[2])) - 1.0)
    out["tdvp_quench_split"] = {
        "L": L, "D": D, "dt": DT, "steps": NSTEP, "krylov_m": M_KRYLOV,
        "energies_tpu_splitc": es, "rel_energy_drift": drift,
        "norm_error": norm_err, "krylov_trunc_estimates": errs,
        "wall_s": round(wall, 2),
    }
    print(f"TPU split-complex TDVP: E(t) = {es}, drift {drift:.2e}, "
          f"norm err {norm_err:.2e}, wall {wall:.1f}s", flush=True)
    assert np.isfinite(es).all()
    assert drift < 2e-3, f"energy drift {drift} above the f32 floor"
    assert norm_err < 1e-3, f"norm error {norm_err}"

    # ---- CPU c128 reference comparison ---------------------------------
    cpu_out, _ = cpu_proc.communicate(timeout=3600)
    es_cpu = None
    for line in cpu_out.splitlines():
        if line.startswith("CPUREF "):
            es_cpu = json.loads(line[len("CPUREF "):])
    assert es_cpu is not None, "CPU reference run failed"
    rel = max(abs(a - b) for a, b in zip(es, es_cpu)) / abs(es_cpu[0])
    out["tdvp_quench_split"]["energies_cpu_c128"] = es_cpu
    out["tdvp_quench_split"]["rel_err_vs_cpu_c128"] = rel
    print(f"CPU c128 E(t) = {es_cpu}; TPU-vs-CPU rel err {rel:.2e}",
          flush=True)
    # the two trajectories start from independently converged ground
    # states (f32 vs f64 DMRG) and use different QR algorithms (split
    # Householder vs LAPACK) — agreement at the f32 floor is the bar
    assert rel < 5e-3, rel

    (ROOT / "TPU_COMPLEX_r04.json").write_text(json.dumps(out, indent=1))
    print("WROTE TPU_COMPLEX_r04.json")


if __name__ == "__main__":
    main()
