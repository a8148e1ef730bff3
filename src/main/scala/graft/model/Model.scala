package graft.model

/** Typed entity model (SURVEY.md §7 module 1, keyed per §1.4): case
  * classes for the core graph entities. `DataFrame`s stay the working
  * representation inside operators (dynamic schemas, codegen'd exprs);
  * these types are the stage-boundary contracts — `Dataset[T]` views are
  * exposed by `graph.GraphTables.typed` so pipeline code downstream of a
  * stage gets compile-time field checking.
  */
final case class Entry(pdbEntry: String, ok: Long)

final case class BoundEntity(
    uniqueID: String,      // "<entry>_<ligand>" (process_pdb_structure.py:139 shape)
    ok: Long,
    ligandUniqueID: Long,  // distinct-structure key (process_all_pdb_contacts.py:222)
    hetCode: String,
    displayID: String)     // "bm{n}" per-entry dense id (process_pdb_structure.py:138)

final case class Domain(
    domainAccession: String,
    suppkey: Long,
    dtype: String,         // CATH | SCOP | Pfam
    superfamily: String,
    nk: Long)

final case class DomainContact(
    uniqueID: String,
    ok: Long,
    pk: Long,
    suppkey: Long,
    contactCount: Long,
    totalContacts: Long,
    perc: Double,
    interactionMode: String) // ownership band (process_pdb_contacts.py:59-78)

final case class CognateLigand(cogId: Long, cogName: String, brand: String,
                               csize: Int)

final case class ParityScore(
    ligandUniqueID: Long,
    cogId: Long,
    parityScore: Double,
    bestCognate: String)   // "Y"/"N" argmax flag (produce_neo4j_files.py:423-425)
