"""q173 streaming component maintenance — restart recovery.

The maintenance loop's whole value is that state OUTLIVES the query:
waves that arrive after a stop must fold into the map the earlier
incarnation left behind, through the stream checkpoint (consumed-file
tracking) and the three state tables.  This test runs the loop, stops,
adds the remaining waves, resumes with the SAME work dir, and requires
the final map to byte-match the single-pass run — and to contain a
cross-incarnation component (a pair whose members arrived in different
query incarnations)."""

import os
import shutil

from postfix_log_parser_spark.ext.streamcc import (
    _write_wave_files,
    q173_stream_components,
    run_maintenance,
)


def test_restart_resumes_from_checkpointed_waves(spark, tmp_path):
    sf = "/root/testdata/sf0.001"
    work = str(tmp_path / "work")
    waves_all = str(tmp_path / "all")
    waves_dir = f"{work}/waves"
    os.makedirs(waves_dir)
    os.makedirs(waves_all)
    _write_wave_files(spark, sf, waves_all)
    names = sorted(os.listdir(waves_all))
    assert len(names) >= 3

    # incarnation 1: only the first wave has arrived
    shutil.copy(f"{waves_all}/{names[0]}", f"{waves_dir}/{names[0]}")
    partial = {
        (r.doc_id, r.component_id)
        for r in run_maintenance(spark, waves_dir, work).collect()
    }

    # the remaining waves arrive while no query is running
    for n in names[1:]:
        shutil.copy(f"{waves_all}/{n}", f"{waves_dir}/{n}")

    # incarnation 2: same work dir — checkpoint skips the consumed wave
    resumed = {
        (r.doc_id, r.component_id)
        for r in run_maintenance(spark, waves_dir, work).collect()
    }

    # reference: the one-shot query on the same corpus
    oneshot = {
        (r.doc_id, r.component_id)
        for r in q173_stream_components(spark, sf).collect()
    }
    assert resumed == oneshot
    assert resumed, "corpus must produce components"
    # incarnation 1 saw only wave 0, so every pair whose members live in
    # different waves (doc_id % 3 differs — all planted twins do: the
    # +100000 offset shifts the wave by 1) was found AFTER the restart
    assert len(resumed) > len(partial)

    # cross-wave components prove the index lookup reached state written
    # by a different micro-batch (and, given the restart point, by a
    # different query incarnation for wave-0 members)
    comps: dict = {}
    for d, c in resumed:
        comps.setdefault(c, set()).add(d % 3)
    assert any(len(waves) > 1 for waves in comps.values()), (
        "no component spans waves — cross-batch merging not exercised"
    )
