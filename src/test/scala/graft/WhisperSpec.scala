package graft

import graft.core.Archive
import graft.store.WhisperFormat
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Pure codec properties for the whisper/hoard binary format (no Spark):
  * write → header/slots must be the identity on any policy-shaped ring
  * content, and the parser must reject malformed headers loudly.
  */
class WhisperSpec extends AnyFunSuite {

  test("write -> header/slots round-trips random ring contents exactly") {
    val rnd = new Random(42)
    (1 to 25).foreach { trial =>
      // random but valid policy: finest step, coarser multiples,
      // strictly growing retention
      val nArch = 1 + rnd.nextInt(3)
      var step = 1L + rnd.nextInt(100)
      var retention = 0L
      val archives = (0 until nArch).map { _ =>
        var points = 2L + rnd.nextInt(50)
        while (step * points <= retention) points += 10
        val ar = Archive(step, points)
        retention = ar.retention
        step *= (2 + rnd.nextInt(3)) // next archive strictly coarser
        ar
      }
      val lastUpdate = 1700000000L + rnd.nextInt(1000000)
      // per archive: distinct aligned timestamps inside the ring span
      val contents = archives.map { ar =>
        val nPts = rnd.nextInt(ar.points.toInt + 1)
        val slots = rnd.shuffle((0L until ar.points).toList).take(nPts)
        val base = (lastUpdate - rnd.nextInt(ar.retention.toInt.max(1))) /
          ar.step * ar.step
        ar -> slots.map { s =>
          val t0 = base + s * ar.step
          // wrap into (lastUpdate - retention, lastUpdate] like live data
          val t = if (t0 > lastUpdate - ar.retention) t0 else t0 + ar.retention
          (t, rnd.nextDouble() * 1000 - 500)
        }.filter { case (t, _) =>
          t > lastUpdate - ar.retention && t > 0
        }.distinct
      }
      val bytes = WhisperFormat.write(lastUpdate, 0.37f, contents)

      val h = WhisperFormat.header(bytes)
      assert(h.lastUpdate == lastUpdate, s"trial $trial")
      assert(h.maxRetention == archives.map(_.retention).max)
      assert(math.abs(h.xff - 0.37f) < 1e-7)
      assert(h.archives.map(a => (a.step.toLong, a.points.toLong)) ==
        archives.map(a => (a.step, a.points)))

      val got = WhisperFormat.slots(bytes).toSeq
        .groupBy(_.step).view
        .mapValues(_.map(s => (s.ts, s.value)).toSet).toMap
      val want = contents.filter(_._2.nonEmpty).map { case (ar, pts) =>
        ar.step.toInt -> pts.toSet
      }.toMap
      assert(got == want, s"trial $trial: ring contents diverged")
    }
  }

  test("parser rejects malformed headers loudly") {
    intercept[IllegalArgumentException](WhisperFormat.header(Array[Byte](1, 2)))
    // implausible archive count
    val bad = java.nio.ByteBuffer.allocate(16)
    bad.putInt(0); bad.putInt(0); bad.putFloat(0.5f); bad.putInt(99999)
    intercept[IllegalArgumentException](WhisperFormat.header(bad.array()))
    // archive table overrunning the file
    val trunc = java.nio.ByteBuffer.allocate(28)
    trunc.putInt(0); trunc.putInt(60); trunc.putFloat(0.5f); trunc.putInt(1)
    trunc.putInt(28); trunc.putInt(1); trunc.putInt(60) // ring needs 720 B
    intercept[IllegalArgumentException](WhisperFormat.header(trunc.array()))
  }
}
