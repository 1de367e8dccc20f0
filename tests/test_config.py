"""Config/Provenance parsing (reference ProvenanceTest.scala:6-12,
Config.scala:22-30)."""

from __future__ import annotations

from dig_aggregator_core_spark.plans.config import Config, Provenance


def test_config_load(tmp_path):
    p = tmp_path / "config.json"
    p.write_text(
        '{"project": "demo", "ledger_dir": "/l", "out_dir": "/o",'
        ' "aws": {"bucket": "b"}}'
    )
    cfg = Config.load(str(p))
    assert cfg.project == "demo"
    assert cfg.ledger_dir == "/l"
    assert cfg.out_dir == "/o"
    assert cfg.extra == {"aws": {"bucket": "b"}}


def test_provenance_from_properties(tmp_path):
    p = tmp_path / "version.properties"
    p.write_text(
        "# build info\n"
        "remote=https://example.org/repo.git\n"
        "branch=main\n"
        "commit=abc123\n"
        "! trailing comment\n"
    )
    prov = Provenance.from_properties(str(p))
    assert prov.source == "https://example.org/repo.git"
    assert prov.branch == "main"
    assert prov.commit == "abc123"
    assert prov.as_metadata() == {
        "source": "https://example.org/repo.git",
        "branch": "main",
        "commit": "abc123",
    }


def test_provenance_missing_file(tmp_path):
    prov = Provenance.from_properties(str(tmp_path / "nope.properties"))
    assert prov == Provenance()
    assert prov.as_metadata() == {}
