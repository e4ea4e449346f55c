package graft.exec

import scala.collection.concurrent.TrieMap
import graft.model.EtlModel
import graft.exec.Tasks.InvalidTaskSpec

/** Accepted-model registry — the security gate of the reference
  * (governor.py:323-347: only pre-registered model classes may run,
  * duplicate names rejected, violations raise InvalidTaskSpec). No
  * reflection of arbitrary class names, same as upstream.
  */
final class TaskRegistry {
  private val models = TrieMap.empty[String, EtlModel]

  /** Register a model; duplicate names are rejected (governor.py:340-344). */
  def register(model: EtlModel): Unit = {
    if (models.putIfAbsent(model.name, model).isDefined)
      throw new InvalidTaskSpec(s"model '${model.name}' already registered")
  }

  def isAccepted(name: String): Boolean = models.contains(name)

  /** Look up an accepted class; unknown names raise (governor.py:371-373). */
  def resolve(name: String): EtlModel =
    models.getOrElse(name,
      throw new InvalidTaskSpec(s"model '$name' is not an accepted class"))

  def acceptedClasses: Seq[String] = models.keys.toSeq.sorted
}
