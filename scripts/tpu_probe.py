"""Trivial-matmul TPU tunnel probe (CLAUDE.md discipline).

Prints one line: "TUNNEL_OK <seconds>" or hangs (caller applies the
timeout). Run as a plain foreground Bash call; the harness may move it
to background, which keeps the tunnel reachable (unlike starting it
backgrounded).
"""
import time

t0 = time.time()
import jax  # noqa: E402

print("jax imported", round(time.time() - t0, 1), flush=True)
d = jax.devices()
print("devices", d, round(time.time() - t0, 1), flush=True)
x = jax.numpy.ones((256, 256), dtype=jax.numpy.bfloat16)
y = float((x @ x).sum())
print("TUNNEL_OK", round(time.time() - t0, 1), "sum", y, flush=True)
