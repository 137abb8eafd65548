#!/usr/bin/env python3
"""Snapshot key-path parity audit.

Compares the JSON key-path *shape* of our committed golden snapshots
(src/test/resources/snapshots/<family>/) against the reference's
(tests/unit/providers/<family>/test-fixtures/snapshots/), family by
family. Arrays flatten to `[]`, so a path looks like
`item.Vulnerability.FixedIn[].Arch`.

Reported per family:
  REF_ONLY  key paths every reference snapshot family has but ours never
            emits (candidate parity gaps)
  OURS_ONLY key paths we emit that the reference never does (candidate
            inventions)

Known deliberate divergences (documented in provider Scaladoc) are
filtered via KNOWN below. Identifier/schema top-level keys are common to
every envelope and skipped.
"""
import json
import sys
from pathlib import Path

REPO = Path("/root/repo/src/test/resources/snapshots")
REF = Path("/root/reference/tests/unit/providers")

# our family dir -> reference snapshot dir (relative to REF); a value of
# None skips the family; default is <fam>/test-fixtures/snapshots
FAMILY_MAP = {
    "ghsa": "github/test-fixtures/snapshots",
    "oracle_elsa": "oracle/test-fixtures/snapshots",
    # our secdb/ dir holds the generic secdb family; the reference's
    # equivalents are the per-distro dirs (wolfi used as representative)
    "secdb": "wolfi/test-fixtures/snapshots",
    # the reference chainguard provider snapshots both legs side by side
    "chainguard": "chainguard/test-fixtures/snapshots/secdb",
    "chainguard_osv": "chainguard/test-fixtures/snapshots/osv",
    # our oracle/ dir is the ksplice-guard OVAL leg exercised against
    # the generic oval fixture; reference oracle is ELSA (mapped above)
    "oracle": None,
}

# the reference ubuntu snapshot dir mixes the legacy OS-shape dirs
# (ubuntu:X.YY, from normalized-cve-data) with the OSV fragment dirs
# (slugs like ubuntu-22.04-lts): split them between our two legs
SUBDIR_FILTER = {
    "ubuntu": lambda d: d.startswith("ubuntu:"),
    "ubuntu_osv": lambda d: not d.startswith("ubuntu:"),
}
FAMILY_MAP["ubuntu_osv"] = "ubuntu/test-fixtures/snapshots"

# (family, path, side) triples that are deliberate, documented
# divergences: side "ref" = reference-only path we intentionally do not
# emit; side "ours" = ours-only path the reference lacks.
KNOWN: set[tuple[str, str, str]] = {
    # canonical JSON drops null-valued keys; the reference writes
    # "withdrawn": null / "Module": null explicitly
    ("ghsa", "item.Advisory.withdrawn", "ref"),
    ("oracle_elsa", "item.Vulnerability.FixedIn[].Module", "ref"),
    ("rhel", "item.Vulnerability.FixedIn[].Module", "ref"),
    # exercised by fixtures on our side only: the reference snapshots
    # never trip these code paths (rhel parser.py:955-981 emits both)
    ("rhel", "item.Vulnerability.FixedIn[].Advisories", "ours"),
    ("rhel", "item.Vulnerability.FixedIn[].Advisories[].Advisory", "ours"),
    ("rhel", "item.Vulnerability.FixedIn[].Advisories[].Channels", "ours"),
    ("rhel", "item.Vulnerability.FixedIn[].Advisories[].Minor", "ours"),
    ("rhel", "item.Vulnerability.FixedIn[].Advisories[].Version", "ours"),
    ("rhel", "item.Vulnerability.FixedIn[].VulnerableRange", "ours"),
    # the reference's shared FixedIn dataclass serializes the
    # VulnerableRange: null default (utils/vulnerability.py:97) for
    # families that never set it; canonical null-drop omits the key
    ("arch", "item.Vulnerability.FixedIn[].VulnerableRange", "ref"),
    ("photon", "item.Vulnerability.FixedIn[].VulnerableRange", "ref"),
    ("sles", "item.Vulnerability.FixedIn[].VulnerableRange", "ref"),
    # our ELSA fixture exercises the arch-discriminating respin the
    # reference snapshots do not (oval_parser.py:281-327 emits Arch)
    ("oracle_elsa", "item.Vulnerability.FixedIn[].Arch", "ours"),
    # passthrough families keep whatever the input carries; our fixtures
    # are richer than the reference's here, not divergent
    ("govulndb", "item.affected[].database_specific", "ours"),
    ("govulndb", "item.affected[].database_specific.source", "ours"),
    ("govulndb", "item.affected[].package.purl", "ours"),
    ("govulndb", "item.credits[].contact", "ours"),
    ("chainguard_libraries", "item.document.products[].@id", "ours"),
    ("chainguard_osv", "item.database_specific", "ours"),
    ("chainguard_osv", "item.database_specific.cpes", "ours"),
    ("chainguard_osv", "item.database_specific.severity", "ours"),
    ("chainguard_osv", "item.withdrawn", "ours"),
    ("bitnami", "item.affected[].versions", "ours"),
    ("bitnami", "item.severity", "ours"),
    ("bitnami", "item.severity[].score", "ours"),
    ("bitnami", "item.severity[].type", "ours"),
    ("bitnami", "item.summary", "ours"),
}


def paths(node, prefix=""):
    out = set()
    if isinstance(node, dict):
        for k, v in node.items():
            p = f"{prefix}.{k}" if prefix else k
            out.add(p)
            out |= paths(v, p)
    elif isinstance(node, list):
        for v in node:
            out |= paths(v, prefix + "[]")
    return out


def family_paths(root: Path, subdir_ok=None) -> set:
    acc = set()
    for f in root.rglob("*.json"):
        if subdir_ok is not None and not subdir_ok(
                f.relative_to(root).parts[0]):
            continue
        try:
            acc |= paths(json.loads(f.read_text()))
        except Exception as e:  # noqa: BLE001
            print(f"  unreadable {f}: {e}", file=sys.stderr)
    return acc


def main():
    failures = 0
    for ours_dir in sorted(REPO.iterdir()):
        fam = ours_dir.name
        ref_fam = FAMILY_MAP.get(fam, f"{fam}/test-fixtures/snapshots")
        if ref_fam is None:
            continue
        ref_dir = REF / ref_fam
        if not ref_dir.is_dir():
            print(f"== {fam}: no reference snapshots ({ref_fam}) — skipped")
            continue
        ours = family_paths(ours_dir)
        ref = family_paths(ref_dir, SUBDIR_FILTER.get(fam))
        ref_only = {p for p in ref - ours
                    if (fam, p, "ref") not in KNOWN}
        ours_only = {p for p in ours - ref
                     if (fam, p, "ours") not in KNOWN}
        # identifier/schema wrappers are universal
        ref_only -= {"identifier", "schema", "item"}
        ours_only -= {"identifier", "schema", "item"}
        if ref_only or ours_only:
            failures += 1
            print(f"== {fam} (vs {ref_fam})")
            for p in sorted(ref_only):
                print(f"  REF_ONLY   {p}")
            for p in sorted(ours_only):
                print(f"  OURS_ONLY  {p}")
        else:
            print(f"== {fam}: shape parity OK ({len(ours & ref)} shared paths)")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
