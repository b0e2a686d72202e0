"""Per-op TPU tunnel capability probe (one fresh session per suspect op).

Round-4 discovery: the tunnel backend's failure modes are finer-grained
than "session good/bad" —

* the CURRENT deployment deterministically rejects **every compile that
  touches a complex dtype** (complex64 constant creation, add, mul, conj,
  fft, rfft) with UNIMPLEMENTED, while every real-valued op probed (pad,
  gather, cumsum, scan, cond, conv, sort, top_k, dynamic_slice, bf16
  matmul, transpose) compiles and runs at speed;
* **one failed compile poisons the whole session**: after any
  UNIMPLEMENTED, every subsequent compile in the same process fails too
  (measured: 14 fresh-shape cumsum compiles all pass in a clean session;
  cumsum fails immediately after one fft failure in the same session).
  Probe order therefore matters — this script spawns ONE subprocess per
  suspect op so a failing op cannot shadow a working one.

Output: one JSON line {"op": ok|fail, ...} plus a "complex_supported" /
"real_supported" summary, suitable for docs/tpu_runs/.
"""
import json
import os
import subprocess
import sys

OPS = {
    # real-valued / structural
    "pad": "jnp.pad(jnp.arange(64.0), (3,5))",
    "gather": "jnp.arange(1024.0)[jnp.arange(0,1024,8)]",
    "cumsum": "jnp.cumsum(jnp.arange(64.0))",
    "scan": "lax.scan(lambda c,x:(c+x,c), 0.0, jnp.arange(64.0))[0]",
    "conv": "jnp.convolve(jnp.arange(64.0), jnp.ones(8), mode='same')",
    "cond": "lax.cond(True, lambda: 1.0, lambda: 2.0)",
    "sort": "jnp.sort(jnp.arange(64.0)[::-1])",
    "top_k": "lax.top_k(jnp.arange(64.0), 4)[0]",
    "dynamic_slice":
        "lax.dynamic_slice(jnp.arange(64.0), (jnp.int32(3),), (8,))",
    "bf16_matmul": ("jnp.ones((128,128),jnp.bfloat16)"
                    " @ jnp.ones((128,128),jnp.bfloat16)"),
    "transpose": "jnp.arange(64.0).reshape(8,8).T",
    "reduce_window":
        "lax.reduce_window(jnp.arange(64.0),0.,lax.add,(8,),(8,),'VALID')",
    # complex dtype
    "c64_create": "jnp.ones(8, jnp.complex64)",
    "c64_add": "jnp.ones(8, jnp.complex64) + jnp.ones(8, jnp.complex64)",
    "c64_mul": "(jnp.arange(8.0)+1j*jnp.ones(8)) * (2-1j)",
    "c64_conj": "jnp.conj(jnp.ones(8, jnp.complex64) * 1j)",
    "fft": "jnp.fft.fft(jnp.arange(64.0).astype(jnp.complex64))",
    "rfft": "jnp.fft.rfft(jnp.arange(64.0))",
}

_CHILD_SRC = """
import sys
import jax, numpy as np
import jax.numpy as jnp
from jax import lax
jax.devices()
try:
    np.asarray(jax.jit(lambda: ({expr}))())
    print('__CAP_OK__')
except Exception as e:
    print('__CAP_FAIL__', str(e)[:120])
"""


def probe_op(expr: str, timeout_s: float = 120.0) -> str:
    try:
        out = subprocess.run(
            [sys.executable, "-c", _CHILD_SRC.format(expr=expr)],
            capture_output=True, text=True, timeout=timeout_s,
            env=dict(os.environ))
    except subprocess.TimeoutExpired:
        return "timeout"
    if "__CAP_OK__" in out.stdout:
        return "ok"
    for line in out.stdout.splitlines():
        if line.startswith("__CAP_FAIL__"):
            return "fail: " + line[len("__CAP_FAIL__"):].strip()[:80]
    return f"no-verdict rc={out.returncode}"


def main() -> int:
    results = {}
    for name, expr in OPS.items():
        results[name] = probe_op(expr)
        print(f"  {name}: {results[name]}", file=sys.stderr, flush=True)
    real_ops = [k for k in OPS if not (k.startswith("c64") or "fft" in k)]
    cplx_ops = [k for k in OPS if k.startswith("c64") or "fft" in k]
    summary = {
        "real_supported": all(results[k] == "ok" for k in real_ops),
        "complex_supported": all(results[k] == "ok" for k in cplx_ops),
        "ops": results,
    }
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    sys.exit(main())
