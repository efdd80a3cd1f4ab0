"""The examples/ pipeline is product documentation that must keep
running: drive it end-to-end at sf0.001 as a subprocess (its own
Spark session — the script calls spark.stop()) and assert the
artifacts and stage accounting it promises."""

from __future__ import annotations

import pytest
import json
import os
import subprocess
import sys


@pytest.mark.slow
def test_training_data_pipeline_end_to_end(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = str(tmp_path / "release_out")
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "examples",
                                      "training_data_pipeline.py"),
         "/root/testdata/sf0.001", out],
        capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]

    summary = json.load(open(os.path.join(out, "summary.json")))
    # every stage is accounted for, monotone non-increasing through
    # the filters, and the splits partition the selection
    for k in ("n_input", "n_after_quality", "n_after_dedup",
              "n_after_cap", "n_after_span_mask", "n_after_decontam",
              "n_mixed", "n_dsir_selected", "quality_bin_counts",
              "bpe_merges", "split_counts"):
        assert k in summary, k
    # every selected doc carries a quality bin; the bpe fit ran
    assert sum(summary["quality_bin_counts"].values()) == summary[
        "n_dsir_selected"
    ]
    assert summary["bpe_merges"] > 0
    chain = [summary["n_input"], summary["n_after_quality"],
             summary["n_after_dedup"], summary["n_after_cap"],
             summary["n_after_span_mask"], summary["n_after_decontam"],
             summary["n_mixed"], summary["n_dsir_selected"]]
    assert all(a >= b for a, b in zip(chain, chain[1:])), chain
    assert summary["valid"] is True
    assert sum(summary["split_counts"].values()) == summary["n_dsir_selected"]

    for artifact in ("corpus.parquet", "corpus_lsh_index.parquet",
                     "eval_holdout.parquet", "quality_audit.parquet",
                     "release"):
        assert os.path.exists(os.path.join(out, artifact)), artifact
    # r7: the example publishes a VERSIONED release — resolve the
    # CURRENT pointer like a reader would. r9: the lifecycle tail
    # publishes v2 (merge revision) and v3 (compaction) on top of the
    # v1 increment, so walk base_version links back to the root
    with open(os.path.join(out, "release", "CURRENT")) as fh:
        version = fh.read().strip()

    def load_manifest(v):
        return json.load(
            open(os.path.join(
                out, "release", "versions", v, "manifest.json"))
        )

    # walk base_version links from CURRENT back to the root publish:
    # the chain must contain the merge revision (guaranteed-different
    # bump -> always publishes); compaction may legitimately no-op
    # when every partition is already at 1 file
    cur_man = load_manifest(version)
    m, kinds = cur_man, []
    while m.get("incremental", {}).get("base_version"):
        inc = m["incremental"]
        kinds.append(
            "compaction" if inc.get("compaction")
            else "merge" if inc.get("merge") else "other"
        )
        m = load_manifest(inc["base_version"])
    assert "merge" in kinds, kinds
    assert m["span_dedup_k"] == 20 and "dsir" in m
    # merge revised rows in place and compaction is content-neutral:
    # corpus size is conserved end to end
    assert cur_man["n_rows"] == m["n_rows"]


@pytest.mark.slow
def test_drift_monitoring_example_end_to_end(tmp_path):
    """Same snapshot on both sides: the profile/drift/PSI/gate chain
    runs clean and exits 0 with a report; example bit-rot fails here
    instead of in a user's scheduler."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = str(tmp_path / "drift_out")
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "examples",
                                      "drift_monitoring.py"),
         "/root/testdata/sf0.001", "/root/testdata/sf0.001", out],
        capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    report = json.load(open(os.path.join(out, "drift_report.json")))
    assert report, "empty drift report"


@pytest.mark.slow
def test_ann_index_lifecycle_end_to_end(tmp_path):
    """The ANN maintenance example: build→publish→serve→append
    drift→plan→split→recluster→refresh→takedown→plan again (r11
    wires ivf_maintenance_plan as the decision, upsert as the
    re-embedding refresh, and delete as the takedown) must run green
    and its own recall gate must hold."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    root = str(tmp_path / "index_root")
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "examples",
                                      "ann_index_lifecycle.py"),
         "/root/testdata/sf0.001", root],
        capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    out = proc.stdout
    assert "published v00000001" in out
    assert "maintenance plan: action=" in out
    assert "reclustered as v00000002" in out
    # the example's own gate: recall restored
    assert "recall did not improve" not in out
    # refresh published v3 in ONE swap; its replay published NOTHING
    assert "refresh: 5 ids re-embedded as v00000003" in out
    assert "replayed refresh: n_changed=0" in out
    # takedown published v4; the replay published NOTHING
    assert "takedown: deleted 3 ids as v00000004" in out
    assert "replayed takedown: n_deleted=0" in out
    assert "post-takedown plan: action=" in out
    # all four versions remain on disk; CURRENT points at v4
    assert os.path.exists(
        os.path.join(root, "versions", "v00000001", "manifest.json")
    )
    cur = open(os.path.join(root, "CURRENT")).read().strip()
    assert cur == "v00000004"
