#!/usr/bin/env python3
"""Line-protocol chemistry worker — the process boundary where RDKit runs
in production (the reference computes canonicalisation and PARITY inside
Python workers: utils.py:153-186, get_pdb_parity.py:88-107). The engine
spawns one worker per Spark partition (graft.chem.ProcessChem) and speaks
a synchronous, pipelined TSV protocol over stdio:

  CANON\t<descriptor>
      -> OK\t<canonical>\t<neutralized>
  PSIZE\t<a>\t<b>\t<bound_size>\t<cognate_size>\t<budget_ms>
      -> OK\t<score>\t<status>            status: ok|timeout
  PMOL\t<a_descriptor>\t<b_descriptor>\t<budget_ms>
      -> OK\t<score>\t<status>
  anything unparseable / a failing computation
      -> ERR\t<message>                   (caller records score 0.0,
                                           status failure — the
                                           reference scores errored
                                           pairs 0, get_pdb_parity.py)

This container has no RDKit, so the chemistry is the engine's
deterministic stand-in algebra — every response is oracle-checkable:

  - canonical(s)  = s.strip().upper()       (FixtureChem.canonicalSmiles)
  - PSIZE score   = max(0, 100 - |bs - cs|) / 100.0
                                            (FixtureChem.parityScore —
                                             one exact int division,
                                             bit-identical to the JVM)
  - PMOL score    = PARITY over token multisets: matching atom count /
                    max atom count (compare_molecules' similarity_score
                    shape — identity descriptors score exactly 1.0)

A production deployment replaces these three functions with RDKit calls
(pdbe_sanitise_smiles, neutralize_atoms, compare_molecules + rdFMCS with
its 40 s timeout) — the protocol, batching, budget, and failure envelope
don't change.

Test hooks (deterministic, documented): a descriptor containing the
token SLOWPAIR makes PSIZE/PMOL exhaust the request budget and return
best-so-far with status timeout (rdFMCS's `canceled` flag — the
reference keeps the partial MCS); a descriptor containing FAILPAIR
raises, exercising the ERR path.
"""
import re
import sys
import time


def canonical(s):
    return s.strip().upper()


def atoms(descriptor):
    """The stand-in molecule: its token multiset."""
    return [t for t in re.split(r"[^A-Za-z0-9]+", descriptor) if t]


def parity_size(bs, cs):
    return max(0.0, (100 - abs(bs - cs)) / 100.0)


def parity_mol(a, b):
    ta, tb = atoms(a), atoms(b)
    if not ta or not tb:
        raise ValueError("empty molecule")
    counts = {}
    for t in ta:
        counts[t] = counts.get(t, 0) + 1
    matching = 0
    for t in tb:
        if counts.get(t, 0) > 0:
            counts[t] -= 1
            matching += 1
    return matching / max(len(ta), len(tb))


def maybe_hooks(fields, budget_ms, score):
    """timeout/failure injection — see module docstring."""
    joined = "\t".join(fields)
    if "FAILPAIR" in joined:
        raise ValueError("injected failure")
    if "SLOWPAIR" in joined:
        # honor the budget the way rdFMCS does: stop AT the deadline and
        # hand back the best-so-far result flagged canceled
        time.sleep(min(budget_ms, 200) / 1000.0)
        return score, "timeout"
    return score, "ok"


def main():
    out = sys.stdout
    for line in sys.stdin:
        line = line.rstrip("\n")
        if not line:
            continue
        try:
            fields = line.split("\t")
            op = fields[0]
            if op == "FLUSH":
                # batch boundary: the engine writes FLUSH after each
                # request batch and only then reads — buffering between
                # markers turns per-line flush syscalls into one per
                # batch (measured as the worker loop's dominant cost)
                out.flush()
                continue
            if op == "CANON":
                c = canonical(fields[1])
                out.write("OK\t%s\t%s\n" % (c, c))
            elif op == "PSIZE":
                a, b, bs, cs, budget = fields[1:6]
                score = parity_size(int(bs), int(cs))
                score, status = maybe_hooks(fields, int(budget), score)
                out.write("OK\t%r\t%s\n" % (score, status))
            elif op == "PMOL":
                a, b, budget = fields[1:4]
                score = parity_mol(a, b)
                score, status = maybe_hooks(fields, int(budget), score)
                out.write("OK\t%r\t%s\n" % (score, status))
            else:
                out.write("ERR\tunknown op: %s\n" % op)
        except Exception as e:  # noqa: BLE001 — every failure must answer
            out.write("ERR\t%s\n" % str(e).replace("\t", " "))


if __name__ == "__main__":
    main()
