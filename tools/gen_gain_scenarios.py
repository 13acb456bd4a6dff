"""Generate the pinned gain-control scenario table from the reference oracle.

Runs the reference encoder (tools/oracle) with its --yaml-log stream over a
transient battery (attacks, double hits, releases, quiet spans — the cases
gain_processor_ut.cpp exercises) and extracts, per (frame, channel, band):
the skip classification, sticky-frame eligibility, the point0-guard verdict,
and the final wire curve points.  Output: tests/golden/gain_scenarios.json,
consumed by tests/test_at3_gain_scenarios.py.

Usage: python tools/gen_gain_scenarios.py   (expects /tmp/oracle/oracle;
build with `sh tools/oracle/build.sh`)
"""
import json
import os
import re
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def parse_yaml_log(path):
    """Line parser for the reference gain yaml stream -> scenario records."""
    recs = []
    frame = ch = band = None
    cur = None
    in_final = False
    for line in open(path):
        s = line.strip()
        m = re.match(r"frame: (\d+)", s)
        if m and "channels" not in s:
            frame = int(m.group(1))
            continue
        m = re.match(r"- channel: (\d+)", s)
        if m:
            ch = int(m.group(1))
            continue
        m = re.match(r"- band: (\d+)", s)
        if m:
            band = int(m.group(1))
            cur = {"frame": frame, "ch": ch, "band": band, "skip": None,
                   "sticky": None, "point0": None, "points": []}
            recs.append(cur)
            in_final = False
            continue
        if cur is None:
            continue
        m = re.match(r"skip: (\w+)", s)
        if m:
            cur["skip"] = m.group(1)
            continue
        m = re.match(r"sticky_frame_eligible: (\w+)", s)
        if m:
            cur["sticky"] = m.group(1) == "true"
            continue
        m = re.match(r"point0_guard: (\w+)", s)
        if m:
            cur["point0"] = m.group(1)
            continue
        if s.startswith("curve_final:"):
            in_final = True
            continue
        if in_final:
            m = re.match(r"- \{level: (\d+), loc: (\d+)\}", s)
            if m:
                cur["points"].append([int(m.group(1)), int(m.group(2))])
            else:
                in_final = False
    return recs


def main():
    from test_at3_gain_scenarios import stimulus
    pcm16, f32 = stimulus()
    f32.T.reshape(-1).tofile("/tmp/gain_scen.f32")
    subprocess.run(["/tmp/oracle/oracle", "at3enc", "/tmp/gain_scen.f32",
                    "2", "132300", "0", "1", "raw", "/tmp/gain_scen_ref.raw",
                    "/tmp/gain_scen_ref.yaml"], check=True)
    recs = parse_yaml_log("/tmp/gain_scen_ref.yaml")
    # drop the pcm-heavy raw fields; keep decisions + wire points
    from collections import Counter
    classes = Counter()
    for r in recs:
        if r["skip"]:
            classes["skip:" + r["skip"]] += 1
        if r["sticky"]:
            classes["sticky"] += 1
        if r["point0"]:
            classes["point0:" + r["point0"]] += 1
        if r["points"]:
            classes["has_points"] += 1
    out = {"records": recs, "classes": dict(classes)}
    dst = os.path.join(REPO, "tests", "golden", "gain_scenarios.json")
    json.dump(out, open(dst, "w"))
    print("records:", len(recs))
    print("classes:", dict(classes))
    print("wrote", dst)


if __name__ == "__main__":
    main()
