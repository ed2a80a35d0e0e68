package graft.graph

import graft.model.{GraftStore, Term}
import graft.engine.TermIds
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Property-graph facade over the statement store — the Blueprints API analog
  * (`bigdata-blueprints/src/main/java/com/bigdata/blueprints/BigdataGraph.java`):
  * vertices are IRI subjects, vertex labels come from rdf:type, edges are
  * IRI-object statements (label = predicate), vertex properties are literal-object
  * statements. All traversals are DataFrame transformations, so multi-hop pipelines
  * compose lazily and Catalyst plans the joins.
  */
final class PropertyGraph(val store: GraftStore) {

  /** (vertex term, label term) for typed subjects. */
  def vertices: DataFrame =
    store.statements.filter(col("p_id") === TermIds.iriId(Term.RDF_TYPE))
      .select(col("s").as("v"), col("o").as("label"))

  /** (src, label, dst) over IRI→IRI statements (excluding rdf:type). */
  def edges: DataFrame =
    store.statements
      .filter(col("o")("kind") =!= Term.KIND_LITERAL &&
        col("p_id") =!= TermIds.iriId(Term.RDF_TYPE))
      .select(col("s").as("src"), col("p").as("label"), col("o").as("dst"))

  /** (v, key, value) literal properties. */
  def properties: DataFrame =
    store.statements.filter(col("o")("kind") === Term.KIND_LITERAL)
      .select(col("s").as("v"), col("p").as("key"), col("o").as("value"))

  /** Out-neighbors over a specific edge label: frontier("v") → ("v", "w"). */
  def out(frontier: DataFrame, label: String): DataFrame =
    frontier.join(store.statements.filter(col("p_id") === TermIds.iriId(label)),
      frontier("v")("id") === col("s")("id"))
      .select(frontier("v"), col("o").as("w"))

  /** In-neighbors over a specific edge label. */
  def in(frontier: DataFrame, label: String): DataFrame =
    frontier.join(store.statements.filter(col("p_id") === TermIds.iriId(label)),
      frontier("v")("id") === col("o")("id"))
      .select(frontier("v"), col("s").as("w"))

  /** Property values for a frontier: ("v") → ("v", value). */
  def values(frontier: DataFrame, key: String): DataFrame =
    frontier.join(store.statements.filter(col("p_id") === TermIds.iriId(key)),
      frontier("v")("id") === col("s")("id"))
      .select(frontier("v"), col("o").as("value"))

  /** Vertices of a class (label local name resolved against urn:c: convention). */
  def verticesOfClass(classIri: String): DataFrame =
    store.statements.filter(col("p_id") === TermIds.iriId(Term.RDF_TYPE) &&
      col("o")("id") === TermIds.iriId(classIri))
      .select(col("s").as("v"))
}
