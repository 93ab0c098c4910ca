#!/usr/bin/env python3
"""Dev-only end-of-round artifact refresher (VERDICT r14 item 7).

CORRECTNESS_skew.json went stale in r14: it was regenerated mid-round,
then a later fixture commit (`87608cb`) changed answers, and the
artifact's green q163 row no longer described HEAD. The fix is
procedural: this script regenerates the non-driver artifacts FROM THE
CURRENT COMMIT as the round's last step, and stamps every artifact with
that commit in ARTIFACTS_MANIFEST.json so staleness is detectable
instead of silent.

    python3 tools/round_artifacts.py            # skew gate (fixture + verify + crosscheck)
    python3 tools/round_artifacts.py --sf1 REF  # + changed-set-vs-REF crosscheck at sf1

Run AFTER the last engine commit of the round (the script refuses a
dirty tree for exactly the reason r14's artifact went stale).
"""
import json, os, subprocess, sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TOOLS = os.path.join(REPO, "tools")


def sh(args, **kw):
    print("[round_artifacts] $", " ".join(args))
    return subprocess.run(args, **kw)


def head_commit():
    return subprocess.run(["git", "rev-parse", "HEAD"], capture_output=True,
                          text=True, cwd=REPO).stdout.strip()


def stamp(manifest, name, **info):
    manifest[name] = {"commit": head_commit(), **info}
    json.dump(manifest, open(os.path.join(REPO, "ARTIFACTS_MANIFEST.json"), "w"),
              indent=1)


def main():
    dirty = subprocess.run(["git", "status", "--porcelain"], capture_output=True,
                           text=True, cwd=REPO).stdout.strip()
    if dirty:
        print("[round_artifacts] REFUSING: working tree dirty — commit first\n" + dirty)
        return 2
    manifest = {}
    mpath = os.path.join(REPO, "ARTIFACTS_MANIFEST.json")
    if os.path.exists(mpath):
        manifest = json.load(open(mpath))

    # 1. skew gate: deterministic fixture from sf0.1, full Verify, crosscheck
    skew = "/tmp/graft_skew"
    r = sh([os.path.join(TOOLS, "run.sh"), "graft.tools.MakeSkew",
            "/root/testdata/sf0.1", skew])
    if r.returncode != 0:
        return 1
    out = "/tmp/ver_skew"
    sh(["rm", "-rf", out])
    r = sh([os.path.join(TOOLS, "run.sh"), "graft.Verify", skew, out])
    if r.returncode != 0:
        print("[round_artifacts] skew Verify FAILED")
        return 1
    env = dict(os.environ, GRAFT_DUCK_MEM=os.environ.get("GRAFT_DUCK_MEM", "24GB"))
    r = sh([sys.executable, os.path.join(TOOLS, "crosscheck.py"), skew, out,
            os.path.join(REPO, "CORRECTNESS_skew.json")], env=env)
    stamp(manifest, "CORRECTNESS_skew.json", fixture=skew,
          crosscheck_exit=r.returncode)

    # 2. optional sf1 changed-set refresh: only the queries whose builders
    # changed since REF re-run at /tmp/sf1 (full-surface sf1 is a
    # once-per-several-rounds cost; the changed set is the staleness risk)
    if "--sf1" in sys.argv:
        ref = sys.argv[sys.argv.index("--sf1") + 1]
        env2 = dict(os.environ, GRAFT_GATE_SF="/tmp/sf1",
                    GRAFT_DUCK_MEM=os.environ.get("GRAFT_DUCK_MEM", "24GB"))
        r = sh([sys.executable, os.path.join(TOOLS, "changed_set.py"),
                "--run", "--diff", ref], env=env2)
        stamp(manifest, "sf1_changed_set", ref=ref, gate_exit=r.returncode)

    print("[round_artifacts] done; manifest:", json.dumps(manifest, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
