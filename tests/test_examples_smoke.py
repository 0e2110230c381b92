"""Examples-as-smoke-tests: every example runs to exit 0 in a subprocess.

Parity with the reference's ``tests/test_examples_smoke.py:7-32``.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EXAMPLES = sorted(
    f
    for f in os.listdir(os.path.join(REPO, "examples"))
    if f.endswith(".py") and not f.startswith("_")
)
DEMOS = sorted(
    f
    for f in os.listdir(os.path.join(REPO, "demonstrations"))
    if f.endswith(".py")
)


def run_script(rel_dir: str, name: str, timeout: int = 300):
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["VBN_SKIP_PLOTS"] = "1"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, name],
        cwd=os.path.join(REPO, rel_dir),
        env=env,
        capture_output=True,
        text=True,
        timeout=timeout,
    )
    assert proc.returncode == 0, (
        f"{name} failed:\nSTDOUT:\n{proc.stdout[-2000:]}\n"
        f"STDERR:\n{proc.stderr[-2000:]}"
    )
    return proc.stdout


@pytest.mark.parametrize("name", EXAMPLES)
def test_example_runs(name):
    run_script("examples", name)


@pytest.mark.parametrize(
    "name", [d for d in DEMOS if d != "2_scalability_num_mechanisms.py"]
)
def test_demo_runs(name):
    run_script("demonstrations", name)


def test_scalability_demo_runs_slow():
    # kept separate: compiles several chain lengths
    run_script("demonstrations", "2_scalability_num_mechanisms.py", timeout=420)
