"""nfa-verify CLI (node_fhe_accelerate_tpu/cli.py; reference cli.ts:271).

In-process invocation of main(argv) — a subprocess would re-pay the whole
JAX/XLA import+compile cost per test for no extra coverage."""
import pytest
import json

from node_fhe_accelerate_tpu.cli import main


@pytest.mark.slow
def test_export_demo_then_verify(tmp_path, capsys):
    pkg = tmp_path / "demo.json"
    assert main(["export-demo", str(pkg)]) == 0
    assert pkg.exists()

    rep_json = tmp_path / "report.json"
    rep_html = tmp_path / "report.html"
    rc = main(["verify", str(pkg), "--json", str(rep_json),
               "--html", str(rep_html), "--quiet"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "VALID" in out and "INVALID" not in out
    rep = json.loads(rep_json.read_text())
    assert rep["valid"] is True
    assert "<html" in rep_html.read_text().lower()


def test_verify_detects_tampered_package(tmp_path, capsys):
    pkg = tmp_path / "demo.json"
    main(["export-demo", str(pkg)])
    data = json.loads(pkg.read_text())
    data["decryptedTally"][0] = int(data["decryptedTally"][0]) + 1
    pkg.write_text(json.dumps(data))
    rc = main(["verify", str(pkg), "--quiet"])
    assert rc == 1
    assert "INVALID" in capsys.readouterr().out
