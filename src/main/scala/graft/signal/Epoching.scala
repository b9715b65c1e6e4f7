package graft.signal

/** Annotation discretization + signal epoching.
  *
  * Mirrors the reference's MNE pipeline (`ingest/processing.py:55-73`):
  * interval annotations (a hypnogram) are discretized into consecutive
  * 30-second events (`events_from_annotations(chunk_duration=30.0)`), and
  * the continuous signal is segmented into per-event windows of exactly
  * `epochLength * sfreq` samples (`tmax = 30 - 1/sfreq` keeps the inclusive
  * MNE endpoint from adding an extra sample — SURVEY §7.4.7).
  */
object Epoching {

  val EpochLengthSeconds = 30.0

  /** One hypnogram annotation: [onset, onset+duration) seconds, stage label. */
  final case class Annotation(onsetSec: Double, durationSec: Double, label: String)

  /** One discretized event: sample offset + label. */
  final case class Event(startSample: Long, label: String)

  /** Chop each annotation into consecutive `chunk`-second events. An event is
    * emitted for every full chunk that fits inside the annotation interval
    * and inside the recording (events starting beyond `nSamples` are
    * dropped, as MNE drops events outside the data range).
    */
  def eventsFromAnnotations(annotations: Seq[Annotation], sfreq: Double,
      nSamples: Long, chunk: Double = EpochLengthSeconds): Vector[Event] = {
    val epochSamples = math.round(chunk * sfreq)
    val out = Vector.newBuilder[Event]
    annotations.foreach { a =>
      val nChunks = math.floor(a.durationSec / chunk + 1e-9).toLong
      var k = 0L
      while (k < nChunks) {
        val start = math.round((a.onsetSec + k * chunk) * sfreq)
        if (start + epochSamples <= nSamples) out += Event(start, a.label)
        k += 1
      }
    }
    out.result().sortBy(_.startSample)
  }

  /** Slice one channel into per-event epochs of exactly `chunk*sfreq`
    * samples.
    */
  def slice(signal: Array[Double], events: Seq[Event], sfreq: Double,
      chunk: Double = EpochLengthSeconds): Vector[Array[Double]] = {
    val n = math.round(chunk * sfreq).toInt
    events.iterator.map { e =>
      java.util.Arrays.copyOfRange(signal, e.startSample.toInt, e.startSample.toInt + n)
    }.toVector
  }

  /** Stage-label dictionary (reference `ingest/config.py:23-32`, F10):
    * 8 annotation strings → canonical stages; stages 3 and 4 both map to N3;
    * anything unknown → NAN.
    */
  val SleepStageMap: Map[String, String] = Map(
    "Sleep stage W" -> "W",
    "Sleep stage 1" -> "N1",
    "Sleep stage 2" -> "N2",
    "Sleep stage 3" -> "N3",
    "Sleep stage 4" -> "N3",
    "Sleep stage R" -> "REM",
    "Movement time" -> "MOVE",
    "Sleep stage ?" -> "NAN")

  def mapStage(label: String): String = SleepStageMap.getOrElse(label, "NAN")
}
