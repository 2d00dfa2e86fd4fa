package graft.ops

import java.util.concurrent.ConcurrentHashMap
import scala.jdk.CollectionConverters._

/** Job-status registry (SURVEY T6): the engine-side equivalent of the
  * reference's DownloadManager task registry
  * (`dl-datalake-ui/backend/routers/ingest.py:33-202`) —
  * pending/running/completed/failed states with per-group concurrency
  * limits, driver-side (orchestration metadata, not data-plane state).
  */
object JobStatus {
  sealed trait State
  case object Pending extends State
  case object Running extends State
  case object Completed extends State
  final case class Failed(error: String) extends State

  final case class Job(id: String, group: String, state: State,
                       progress: Long, startedMs: Long, updatedMs: Long)
}

final class JobRegistry(maxPerGroup: Int = 5, maxTotal: Int = 20) {
  import JobStatus._

  private val jobs = new ConcurrentHashMap[String, Job]()

  def submit(id: String, group: String): Boolean = synchronized {
    val running = jobs.values.asScala.count(_.state == Running)
    val groupRunning = jobs.values.asScala.count(j => j.group == group && j.state == Running)
    val now = System.currentTimeMillis()
    if (running >= maxTotal || groupRunning >= maxPerGroup) {
      jobs.put(id, Job(id, group, Pending, 0L, now, now)); false
    } else {
      jobs.put(id, Job(id, group, Running, 0L, now, now)); true
    }
  }

  /** Promote the oldest pending job in a group if BOTH the group and
    * total running limits allow it.
    */
  def promoteNext(group: String): Option[String] = synchronized {
    val running = jobs.values.asScala.count(_.state == Running)
    val groupRunning = jobs.values.asScala.count(j => j.group == group && j.state == Running)
    if (groupRunning >= maxPerGroup || running >= maxTotal) None
    else jobs.values.asScala.filter(j => j.group == group && j.state == Pending)
      .toSeq.sortBy(_.startedMs).headOption.map { j =>
        jobs.put(j.id, j.copy(state = Running, updatedMs = System.currentTimeMillis()))
        j.id
      }
  }

  // mutators synchronized: an unsynchronized read-copy-put could let a
  // late progress() overwrite a concurrent fail()/complete() transition
  def progress(id: String, rows: Long): Unit = synchronized {
    Option(jobs.get(id)).foreach(j =>
      jobs.put(id, j.copy(progress = rows, updatedMs = System.currentTimeMillis())))
  }

  def complete(id: String): Unit = synchronized {
    Option(jobs.get(id)).foreach(j =>
      jobs.put(id, j.copy(state = Completed, updatedMs = System.currentTimeMillis())))
  }

  def fail(id: String, error: String): Unit = synchronized {
    Option(jobs.get(id)).foreach(j =>
      jobs.put(id, j.copy(state = Failed(error), updatedMs = System.currentTimeMillis())))
  }

  def get(id: String): Option[Job] = Option(jobs.get(id))
  def all(): Seq[Job] = jobs.values.asScala.toSeq.sortBy(_.startedMs)
}
