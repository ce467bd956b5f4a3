#!/usr/bin/env python3
"""Artifact-integrity gate: validate the packaged library jar the way the
reference validates its patched dependency jars (non-empty file, valid
zip, META-INF/MANIFEST.MF present; see reference update-dependencies.py
_check_downloaded_file) and additionally check that the jar carries the
classes the driver contract needs (SparkEntry/Verify/Bench mains).

Usage:
    python3 tools/jar_check.py [path-to-jar ...]

With no args, checks every graft*.jar under target/scala-2.13/
(run `sbt package` first). Exit 0 = all jars pass; 1 = any failure.
"""
import glob
import os
import sys
import zipfile

REQUIRED_CLASSES = [
    "graft/SparkEntry$.class",
    "graft/Verify$.class",
    "graft/Bench$.class",
]


def check_jar(path: str) -> list:
    """Return a list of failure strings for one jar (empty = pass)."""
    if not os.path.isfile(path):
        return [f"missing file: {path}"]
    if os.path.getsize(path) == 0:
        return [f"0-byte jar: {path}"]
    if not zipfile.is_zipfile(path):
        return [f"not a valid zip: {path}"]
    fails = []
    with zipfile.ZipFile(path, "r") as archive:
        bad = archive.testzip()  # CRC check on every entry, not just the directory
        if bad is not None:
            fails.append(f"corrupt entry {bad!r} in {path}")
        names = set(archive.namelist())
        if "META-INF/MANIFEST.MF" not in names:
            fails.append(f"missing META-INF/MANIFEST.MF in {path}")
        for cls in REQUIRED_CLASSES:
            if cls not in names:
                fails.append(f"missing {cls} in {path}")
    return fails


def main() -> int:
    jars = sys.argv[1:] or sorted(
        j for j in glob.glob(os.path.join(os.path.dirname(__file__), os.pardir,
                                          "target", "scala-2.13", "*.jar"))
        # library jar only: -sources/-tests/-javadoc jars legitimately
        # lack the driver-contract classes and must not fail the gate
        if not j.endswith(("-sources.jar", "-tests.jar", "-javadoc.jar")))
    if not jars:
        print("FAIL: no jar found — run `sbt package` first", file=sys.stderr)
        return 1
    rc = 0
    for jar in jars:
        fails = check_jar(jar)
        if fails:
            rc = 1
            for f in fails:
                print(f"FAIL: {f}", file=sys.stderr)
        else:
            n = len(zipfile.ZipFile(jar).namelist())
            print(f"PASS: {os.path.basename(jar)} — valid zip, manifest present, "
                  f"{n} entries, driver-contract classes found")
    return rc


if __name__ == "__main__":
    sys.exit(main())
