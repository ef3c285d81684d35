"""Generation-endpoint health checks and process monitoring.

Equivalents of the reference's vLLM operational checks
(``check_vllm_status``/``monitor_vllm_process``, functions.py:577-613); the
generation server stays an external HTTP service in this framework too, so
the seam is identical.
"""

from __future__ import annotations

import subprocess
import time
from typing import Tuple

import httpx


def check_vllm_status(url: str = "http://localhost:8000/health") -> bool:
    """True if the serving endpoint answers its health route."""
    try:
        return httpx.get(url, timeout=5).status_code == 200
    except httpx.HTTPError:
        return False


def monitor_vllm_process(vllm_process: subprocess.Popen, check_interval: int = 5,
                         health_url: str = "http://localhost:8000/health",
                         max_wait: float = 600.0) -> Tuple[bool, str, str]:
    """Wait for a serving subprocess to come up; stream its output meanwhile.

    Returns (success, stdout, stderr). Unlike the reference, a ``max_wait``
    bound prevents an infinite wait on a wedged server.
    """
    print("Starting server monitoring...")
    deadline = time.time() + max_wait
    while vllm_process.poll() is None and time.time() < deadline:
        if check_vllm_status(health_url):
            print("server is up and running")
            return True, "", ""
        print("Waiting for server to start...")
        time.sleep(check_interval)
        for stream, label in ((vllm_process.stdout, "STDOUT"),
                              (vllm_process.stderr, "STDERR")):
            if stream is not None and stream.readable():
                data = stream.read1().decode("utf-8", "replace") if hasattr(stream, "read1") else ""
                if data:
                    print(f"{label}:", data)
    if vllm_process.poll() is None:
        return False, "", f"server did not become healthy within {max_wait}s"
    stdout, stderr = vllm_process.communicate()
    return False, (stdout or b"").decode("utf-8", "replace"), (stderr or b"").decode("utf-8", "replace")
