"""CLI tests (reference parity: fewbit quantize / version)."""

import numpy as np

from fewbit_tpu.cli import main


def test_version(capsys):
    assert main(["version"]) == 0
    assert "fewbit-tpu" in capsys.readouterr().out


def test_quantize_gelu(tmp_path):
    out = tmp_path / "luts.npz"
    rc = main(["quantize", "2", "jax.nn:gelu", "-o", str(out),
               "-s", "42", "-M", "4000", "-b", "1e-5", "-l", "1e-5"])
    assert rc == 0
    with np.load(out) as npz:
        assert "gelu02-borders" in npz.files
        borders = npz["gelu02-borders"]
        levels = npz["gelu02-levels"]
    assert borders.size == levels.size + 1 == 5
    # Merge another entry into the same archive.
    rc = main(["quantize", "1", "jax.numpy:tanh", "-o", str(out),
               "-s", "1", "-M", "4000"])
    assert rc == 0
    with np.load(out) as npz:
        assert {"gelu02-borders", "tanh01-borders"} <= set(npz.files)


def test_quantize_loadable_by_store(tmp_path):
    from fewbit_tpu.lut import StepwiseStore

    out = tmp_path / "luts.npz"
    assert main(["quantize", "2", "jax.nn:silu", "-o", str(out),
                 "-s", "3", "-M", "4000"]) == 0
    store = StepwiseStore()
    store.load(out)
    borders, levels = store.get_interior("silu", 2)
    assert borders.size == 3 and levels.size == 4


def test_usage_without_command(capsys):
    assert main([]) == 0


def test_help_subcommand(capsys):
    assert main(["help"]) == 0
    assert "quantize" in capsys.readouterr().out


def test_help_topic(capsys):
    assert main(["help", "quantize"]) == 0
    assert "nobits" in capsys.readouterr().out
