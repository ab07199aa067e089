"""Driver-entry regression tests.

dryrun_multichip is the ONLY official multi-chip correctness signal; round 1
failed it because a handful of eager ops (PRNGKey, deep-supervision weights)
dispatched to the default (TPU) platform whose plugin was unusable in the
driver environment. The contract: the function must run start-to-finish
having initialized NOTHING but the cpu backend, in a fresh process with no
help from env vars (some environments pin jax_platforms at interpreter
start, so it must pin cpu itself).
"""
import os
import subprocess
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_PROBE = """
import __graft_entry__
__graft_entry__.dryrun_multichip(8)
from jax._src import xla_bridge
ks = sorted(xla_bridge._backends.keys())
assert ks == ["cpu"], f"non-cpu backend initialized: {ks}"
print("BACKENDS-OK")
"""


def test_dryrun_multichip_cpu_only_fresh_process():
    env = dict(os.environ)
    # no help: the function itself must force the device count + platform
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)
    out = subprocess.run(
        [sys.executable, "-c", _PROBE], cwd=_REPO, env=env,
        capture_output=True, text=True, timeout=900,
    )
    assert out.returncode == 0, f"stdout={out.stdout}\nstderr={out.stderr}"
    assert "BACKENDS-OK" in out.stdout
    assert "dryrun_multichip(8) OK" in out.stdout
