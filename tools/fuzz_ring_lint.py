"""Fuzz-ring co-registration lint (round-6 verdict item 7).

The differential-fuzz rings (tests/test_differential_fuzz.py) are the
only gate that sees firing-path behavior — they found 12 real
cross-engine divergences in round 6. The co-registration rule: every
contract in ``__spark_entry__.queries()`` must belong to a ring
(``*_FUZZ_QUERIES``) or carry an explicit exemption with a reason
(``FUZZ_EXEMPT``) in the same commit that registers it.

Usage: python tools/fuzz_ring_lint.py   (exit 1 on violations)
"""

from __future__ import annotations

import importlib.util
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))


def ring_membership() -> tuple[dict[str, list[str]], dict[str, str]]:
    spec = importlib.util.spec_from_file_location(
        "_fuzz_mod", ROOT / "tests" / "test_differential_fuzz.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    rings = {
        a: list(getattr(mod, a)) for a in dir(mod) if a.endswith("FUZZ_QUERIES")
    }
    return rings, dict(getattr(mod, "FUZZ_EXEMPT", {}))


def main() -> int:
    import __spark_entry__ as e

    rings, exempt = ring_membership()
    registered = set(e.queries())
    ringed: set[str] = set()
    for members in rings.values():
        ringed |= set(members)

    unringed = sorted(registered - ringed - set(exempt))
    ghost_ring = sorted(ringed - registered)
    ghost_exempt = sorted(set(exempt) - registered)
    double = sorted((ringed & set(exempt)) & registered)

    print(
        f"registered: {len(registered)}; ringed: {len(ringed & registered)}; "
        f"exempt: {len(set(exempt) & registered)}; "
        f"rings: {', '.join(f'{k}={len(v)}' for k, v in sorted(rings.items()))}"
    )
    ok = True
    if unringed:
        ok = False
        print("FAIL — registered contracts in no ring and not exempted:")
        for n in unringed:
            print(f"  {n}  (add to a *_FUZZ_QUERIES ring or FUZZ_EXEMPT with a reason)")
    if ghost_ring:
        ok = False
        print("FAIL — ring members that are not registered contracts:")
        for n in ghost_ring:
            print(f"  {n}")
    if ghost_exempt:
        ok = False
        print("FAIL — exemptions for names that are not registered contracts:")
        for n in ghost_exempt:
            print(f"  {n}")
    if double:
        print("warn — both ringed and exempted (drop the exemption):")
        for n in double:
            print(f"  {n}")
    if ok:
        print("ok — every contract is ringed or explicitly exempted")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
