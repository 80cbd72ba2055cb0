"""Packaging metadata stays consistent with the code.

Guards pyproject.toml: every console-script target must resolve to a
callable, and the project version must match the package's __version__ so
`pip install -e .` exposes the same CLI surface the docs (README quick
start, docs/MIGRATION.md) promise.
"""

import importlib
import pathlib
import tomllib

import torch_tts_tpu

ROOT = pathlib.Path(__file__).resolve().parents[1]


def _project():
    with open(ROOT / "pyproject.toml", "rb") as f:
        return tomllib.load(f)["project"]


def test_console_scripts_resolve():
    scripts = _project()["scripts"]
    assert scripts, "no console scripts declared"
    for name, target in scripts.items():
        mod_name, fn_name = target.split(":")
        mod = importlib.import_module(mod_name)
        assert callable(getattr(mod, fn_name)), f"{name} -> {target}"


def test_version_matches_package():
    assert _project()["version"] == torch_tts_tpu.__version__


def test_every_cli_module_has_a_script():
    """Each CLI module (except the package init and pure-library helpers)
    is reachable from an installed console script."""
    scripts = {v.split(":")[0] for v in _project()["scripts"].values()}
    cli_dir = ROOT / "torch_tts_tpu" / "cli"
    missing = []
    for p in sorted(cli_dir.glob("*.py")):
        if p.stem == "__init__":
            continue
        mod = f"torch_tts_tpu.cli.{p.stem}"
        if mod not in scripts:
            missing.append(mod)
    # vits2_vc has a script; keep this exhaustive so new CLIs get packaged
    assert not missing, f"CLI modules without console scripts: {missing}"
