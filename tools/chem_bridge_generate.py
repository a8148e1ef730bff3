#!/usr/bin/env python3
"""Offline chemistry-bridge fixture generator (docs/CHEM_BRIDGE.md).

Runs OUTSIDE the engine container, in a Python environment with RDKit
(the reference pipeline's own environment — see the reference repo's
nextflow/bin/utils.py:153-186 sanitisation and get_pdb_parity.py:31-51
neutralisation, :88-107 PARITY scoring, whose BEHAVIOR this reproduces
from the published PARITY method; no reference code is imported).

Inputs (parquet):
  descriptors.parquet   one column  `smiles_in` STRING — the DISTINCT
                        ligand descriptors of the dimension (the engine's
                        `bound_descriptors` export or the cognate table)
  pairs.parquet         two columns `ligand_a`, `ligand_b` STRING — the
                        blocked candidate pairs the engine generates
                        (GraphTables' (brand, size-bucket) blocking);
                        pairs are normalized so ligand_a <= ligand_b

Outputs (parquet, the TableChem contract — ChemBridgeContractSpec):
  chem_canonical.parquet  smiles_in STRING (unique key),
                          canonical STRING, neutralized STRING
  chem_parity.parquet     ligand_a STRING, ligand_b STRING
                          ((a,b) unique key, a <= b),
                          score DOUBLE in [0,1], mcs_smarts STRING

Usage:
  python3 chem_bridge_generate.py <descriptors.parquet> <pairs.parquet> <outDir>
"""
import sys

import pandas as pd
from rdkit import Chem
from rdkit.Chem import rdFMCS

# MCS wall-clock cap per pair, as the reference caps compare_molecules
# (get_pdb_parity.py:96 uses a 40 s timeout)
MCS_TIMEOUT_S = 40


def canonicalize(smiles: str):
    """Sanitised canonical SMILES, or None if RDKit cannot parse.

    Mirrors the reference's pdbe_sanitise_smiles behavior
    (utils.py:153-186): parse without sanitising, then sanitise, then
    emit RDKit canonical SMILES.
    """
    mol = Chem.MolFromSmiles(smiles, sanitize=False)
    if mol is None:
        return None
    try:
        Chem.SanitizeMol(mol)
    except Exception:
        return None
    return Chem.MolToSmiles(mol)


def neutralize(smiles: str):
    """Neutralised form: protonate/deprotonate charged atoms that have an
    implicit-H route to neutrality. This is the standard published
    neutralisation pattern (the same one the reference's neutralize_atoms
    uses, get_pdb_parity.py:31-51): for every atom with nonzero formal
    charge, no carbanion-style stabilisation partner, and a matching H
    count, set charge 0 and adjust H count.
    """
    mol = Chem.MolFromSmiles(smiles)
    if mol is None:
        return None
    # guarded per-molecule: a charged atom whose H adjustment yields an
    # invalid valence (e.g. tetrafluoroborate's B-: SetNumExplicitHs(1)
    # gives boron 5 bonds) raises in UpdatePropertyCache — keep the
    # original canonical form for that descriptor instead of aborting
    # the whole generation run (the reference likewise leaves
    # un-neutralisable ligands as-is)
    try:
        pattern = Chem.MolFromSmarts("[+1!h0!$([*]~[-1,-2,-3,-4]),-1!$([*]~[+1,+2,+3,+4])]")
        at_matches = mol.GetSubstructMatches(pattern)
        for (idx,) in at_matches:
            atom = mol.GetAtomWithIdx(idx)
            chg = atom.GetFormalCharge()
            h_count = atom.GetTotalNumHs()
            atom.SetFormalCharge(0)
            atom.SetNumExplicitHs(h_count - chg)
            atom.UpdatePropertyCache()
        return Chem.MolToSmiles(mol)
    except Exception:
        return Chem.MolToSmiles(Chem.MolFromSmiles(smiles))


def parity_score(smiles_a: str, smiles_b: str):
    """PARITY similarity: matching atoms / (n_a + n_b - matching), where
    `matching` counts MCS-mapped atom pairs whose elements agree — the
    published PARITY definition the reference implements
    (get_pdb_parity.py:88-107). Returns (score, mcs_smarts); (0.0, "")
    on any parse/MCS failure — the engine's score-0-on-failure
    convention (chem/ParityScorer.scala).
    """
    mol_a = Chem.MolFromSmiles(smiles_a)
    mol_b = Chem.MolFromSmiles(smiles_b)
    if mol_a is None or mol_b is None:
        return 0.0, ""
    try:
        # PERMISSIVE typing (CompareAny), as the reference's FindMCS call
        # (get_pdb_parity.py:93-99) and the published PARITY method: the
        # MCS maps the largest common GRAPH, and the element-agreement
        # count below then credits only same-element mapped pairs. Under
        # the default CompareElements every mapped pair already shares an
        # element, which silently reduces PARITY to plain MCS fraction —
        # wrong for hetero-substituted analogues (e.g. pyridine/benzene).
        mcs = rdFMCS.FindMCS(
            [mol_a, mol_b],
            atomCompare=rdFMCS.AtomCompare.CompareAny,
            bondCompare=rdFMCS.BondCompare.CompareAny,
            matchValences=False,
            ringMatchesRingOnly=False,
            completeRingsOnly=True,
            timeout=MCS_TIMEOUT_S,
        )
        if not mcs.smartsString:
            return 0.0, ""
        patt = Chem.MolFromSmarts(mcs.smartsString)
        # ALL embeddings on both sides, and the element-agreement count
        # is the MAX over embedding pairs — the PARITY definition scores
        # the best atom mapping, not whichever single embedding RDKit
        # happens to return first (one arbitrary GetSubstructMatch
        # undercounts symmetric/ring systems where embeddings differ in
        # how many mapped pairs share an element, and is nondeterministic
        # across RDKit versions/atom orderings). uniquify=False because
        # symmetry-distinct embeddings map the same atom SET differently
        # — exactly the variation being maximized over; the embedding
        # count is bounded by maxMatches for pathological symmetry.
        matches_a = mol_a.GetSubstructMatches(
            patt, uniquify=False, maxMatches=256)
        matches_b = mol_b.GetSubstructMatches(
            patt, uniquify=False, maxMatches=256)
        # empty-match = the SMARTS failed to re-match a molecule (possible
        # with timeout-truncated query SMARTS): a computation FAILURE, so
        # keep the (0.0, "") convention — a non-empty mcs_smarts must
        # always mean "computed", never "failed" (the engine's C11
        # cache-probe distinguishes the two)
        if not matches_a or not matches_b:
            return 0.0, ""
        # The element-agreement count depends on an embedding ONLY through
        # its mapped atomic-number tuple, so dedupe each side by that
        # signature before the cross product: symmetric ring systems
        # collapse from up-to-256 embeddings to a handful of distinct
        # element tuples (the 256x256 scan was the fixture-generation
        # hotspot), and the max becomes independent of RDKit's enumeration
        # order under maxMatches truncation — two embeddings with the same
        # signature are interchangeable, so dropping either never changes
        # the max.
        sigs_a = {
            tuple(mol_a.GetAtomWithIdx(i).GetAtomicNum() for i in m)
            for m in matches_a
        }
        sigs_b = {
            tuple(mol_b.GetAtomWithIdx(i).GetAtomicNum() for i in m)
            for m in matches_b
        }
        matching = max(
            sum(1 for za, zb in zip(sig_a, sig_b) if za == zb)
            for sig_a in sigs_a
            for sig_b in sigs_b
        )
        denom = mol_a.GetNumAtoms() + mol_b.GetNumAtoms() - matching
        if denom <= 0:
            return 0.0, ""
        return matching / denom, mcs.smartsString
    except Exception:
        return 0.0, ""


def main():
    desc_path, pairs_path, out_dir = sys.argv[1], sys.argv[2], sys.argv[3]

    desc = pd.read_parquet(desc_path)["smiles_in"].drop_duplicates()
    canon_rows = []
    for s in desc:
        c = canonicalize(s)
        if c is None:
            continue  # unparseable descriptors are absent → the engine's
            # C11 cache-probe reports them as the next offline work list
        canon_rows.append({"smiles_in": s, "canonical": c,
                           "neutralized": neutralize(s) or c})
    canon = pd.DataFrame(canon_rows,
                         columns=["smiles_in", "canonical", "neutralized"])
    assert canon["smiles_in"].is_unique
    canon.to_parquet(f"{out_dir}/chem_canonical.parquet", index=False)

    pairs = pd.read_parquet(pairs_path)[["ligand_a", "ligand_b"]]
    # normalize + dedupe: (a, b) with a <= b is the join-key contract
    flipped = pairs["ligand_a"] > pairs["ligand_b"]
    pairs.loc[flipped, ["ligand_a", "ligand_b"]] = pairs.loc[
        flipped, ["ligand_b", "ligand_a"]].values
    pairs = pairs.drop_duplicates()
    scored = []
    for a, b in pairs.itertuples(index=False):
        score, smarts = parity_score(a, b)
        scored.append({"ligand_a": a, "ligand_b": b,
                       "score": score, "mcs_smarts": smarts})
    par = pd.DataFrame(scored,
                       columns=["ligand_a", "ligand_b", "score", "mcs_smarts"])
    assert ((par["score"] >= 0.0) & (par["score"] <= 1.0)).all()
    par.to_parquet(f"{out_dir}/chem_parity.parquet", index=False)
    print(f"wrote {len(canon)} canonical rows, {len(par)} parity rows -> {out_dir}")


if __name__ == "__main__":
    main()
