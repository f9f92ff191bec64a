package graft.model

import org.apache.avro.{Schema, SchemaCompatibility}
import org.apache.avro.SchemaCompatibility.SchemaCompatibilityType

/** Confluent-style schema-compatibility rules over Avro's own
  * checker — the registry's evolution gate. The reference inherits
  * the registry default (BACKWARD) by never setting a subject
  * config; this module spells the whole public matrix out so the
  * in-process registry ([[SchemaRegistryServer]]) can ENFORCE it on
  * registration exactly as a real registry would:
  *
  *  - BACKWARD:  the NEW schema reads data written by the LATEST
  *    prior (consumers upgrade first);
  *  - FORWARD:   the LATEST prior reads data written by the NEW
  *    schema (producers upgrade first);
  *  - FULL:      both;
  *  - *_TRANSITIVE: the same check against EVERY prior version, not
  *    just the latest;
  *  - NONE:      no check.
  *
  * The reader/writer primitive is
  * `SchemaCompatibility.checkReaderWriterCompatibility` — Avro's
  * canonical resolution rules (added fields need defaults for the
  * reader, removed fields need defaults on the writer side to be
  * re-readable, promotions int→long→float→double, union widening),
  * the same rules the Confluent registry applies.
  */
object SchemaCompat {

  sealed abstract class Mode(val name: String)
  case object None extends Mode("NONE")
  case object Backward extends Mode("BACKWARD")
  case object Forward extends Mode("FORWARD")
  case object Full extends Mode("FULL")
  case object BackwardTransitive extends Mode("BACKWARD_TRANSITIVE")
  case object ForwardTransitive extends Mode("FORWARD_TRANSITIVE")
  case object FullTransitive extends Mode("FULL_TRANSITIVE")

  val modes: Seq[Mode] = Seq(None, Backward, Forward, Full,
    BackwardTransitive, ForwardTransitive, FullTransitive)

  def modeOf(name: String): Mode =
    modes.find(_.name == name.toUpperCase).getOrElse(
      throw new IllegalArgumentException(s"unknown compatibility mode: $name"))

  /** Can `reader` read data written with `writer`? */
  def canRead(reader: Schema, writer: Schema): Boolean =
    SchemaCompatibility.checkReaderWriterCompatibility(reader, writer)
      .getType == SchemaCompatibilityType.COMPATIBLE

  /** Is `candidate` an acceptable next version after `priors`
    * (oldest-first) under `mode`? Empty priors are always
    * acceptable (the first version of a subject).
    */
  def check(mode: Mode, candidate: Schema, priors: Seq[Schema]): Boolean = {
    val against: Seq[Schema] = mode match {
      case None => Seq.empty
      case Backward | Forward | Full => priors.lastOption.toSeq
      case BackwardTransitive | ForwardTransitive | FullTransitive => priors
    }
    against.forall { prior =>
      mode match {
        case None => true
        case Backward | BackwardTransitive => canRead(candidate, prior)
        case Forward | ForwardTransitive => canRead(prior, candidate)
        case Full | FullTransitive =>
          canRead(candidate, prior) && canRead(prior, candidate)
      }
    }
  }
}
