"""cutesv_tpu.utils.command vs the reference CommandRunner semantics
(reference src/cuteSV/CommandRunner.py)."""
import os
import stat
import time

from cutesv_tpu.utils.command import Command, CommandRunner, exe, partition


def test_exe_captures_interleaved_output():
    ret, out, err = exe("echo to-stdout; echo to-stderr 1>&2")
    assert ret == 0
    assert b"to-stdout" in out and b"to-stderr" in out  # 2>&1 fold
    assert not err  # stderr pipe is folded into stdout


def test_exe_nonzero_retcode():
    ret, out, err = exe("exit 3")
    assert ret == 3


def test_exe_timeout_kills_group_and_returns_214():
    t0 = time.time()
    # timeout is in MINUTES (reference CommandRunner.py:19-22)
    ret, out, err = exe("sleep 30", timeout=1 / 60.0)
    assert (ret, out, err) == (214, None, None)
    assert time.time() - t0 < 10


def test_partition_round_robin_drops_empties():
    # reference partition (CommandRunner.py:139-151): round-robin
    assert partition([1, 2, 3, 4, 5], 2) == [[1, 3, 5], [2, 4]]
    assert partition([1], 3) == [[1]]
    assert partition([], 2) == []


def test_runner_default_template_runs_locally(tmp_path):
    runner = CommandRunner()
    assert runner.run_type == "Running"
    outf = tmp_path / "o.txt"
    errf = tmp_path / "e.txt"
    ret, _, _ = runner(Command("echo hi", "j1", str(outf), str(errf)))
    assert ret == 0
    assert outf.read_text().strip() == "hi"


def test_runner_list_sequential(tmp_path):
    runner = CommandRunner()
    cmds = [Command("echo %d" % i, "j%d" % i,
                    str(tmp_path / ("o%d" % i)), str(tmp_path / ("e%d" % i)))
            for i in range(3)]
    rets = runner(cmds)
    assert [r[0] for r in rets] == [0, 0, 0]
    assert (tmp_path / "o2").read_text().strip() == "2"


def test_runner_chunks_scripts_and_submits(tmp_path):
    # njobs>0: commands chunked into executable scripts, each submitted
    # through the template (reference CommandRunner.py:92-118)
    marker = tmp_path / "ran.txt"
    runner = CommandRunner(njobs=2)
    runner.run_type = "Running"
    cmds = [Command("echo c%d >> %s" % (i, marker), "j%d" % i, "", "")
            for i in range(4)]
    rets = runner(cmds, w_dir=str(tmp_path), id=str(tmp_path / "batch"))
    assert len(rets) == 2 and all(r[0] == 0 for r in rets)
    for chunk in (0, 1):
        script = tmp_path / ("batch_chunk%d.sh" % chunk)
        assert script.exists()
        assert os.stat(script).st_mode & stat.S_IXUSR
    # round-robin: chunk0 = c0,c2 ; chunk1 = c1,c3 — all four ran
    assert sorted(marker.read_text().split()) == ["c0", "c1", "c2", "c3"]


def test_runner_cluster_template_substitution(tmp_path):
    log = tmp_path / "submits.txt"
    runner = CommandRunner("echo SUBMIT ${JOBNAME} ${CMD} >> %s" % log,
                           njobs=0)
    assert runner.run_type == "Submitting"
    runner([Command("work-a", "jobA", "oa", "ea"),
            Command("work-b", "jobB", "ob", "eb")])
    text = log.read_text()
    assert "SUBMIT jobA work-a" in text and "SUBMIT jobB work-b" in text


def test_check_template():
    assert CommandRunner("${CMD} > ${STDOUT}").check_template()
    assert not CommandRunner("${CMD} ${NOSUCHKEY}").check_template()
