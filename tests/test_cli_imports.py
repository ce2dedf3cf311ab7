"""Every CLI module must import and expose main() (argparse surfaces)."""

import importlib

import pytest

CLIS = [
    "affganwriting_tpu.cli.train_word",
    "affganwriting_tpu.cli.train_line",
    "affganwriting_tpu.cli.train_hwr",
    "affganwriting_tpu.cli.generate_word",
    "affganwriting_tpu.cli.get_styles",
    "affganwriting_tpu.cli.evaluate",
    "affganwriting_tpu.cli.teacher_check",
    "affganwriting_tpu.cli.inspect_ckpt",
    "affganwriting_tpu.eval.fid",
    "affganwriting_tpu.eval.generated",
    "affganwriting_tpu.utils.graph",
    "affganwriting_tpu.serve.app",
]


@pytest.mark.parametrize("mod", CLIS)
def test_cli_importable(mod):
    m = importlib.import_module(mod)
    assert any(hasattr(m, fn) for fn in ("main", "selftest", "plot")), mod


def test_cli_help_exits_cleanly():
    import affganwriting_tpu.cli.train_word as tw

    with pytest.raises(SystemExit) as e:
        tw.main(["--help"])
    assert e.value.code == 0


def test_emit_jobs_writes_shards(tmp_path):
    from affganwriting_tpu.cli import emit_jobs

    scripts = emit_jobs.main([
        "--ckpt", "x/ckpt", "--shard", "2", "--out", str(tmp_path)])
    assert len(scripts) == 2
    body = open(scripts[0]).read()
    assert "generate_word" in body and "--writers" in body
