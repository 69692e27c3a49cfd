package graft

import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}

import org.apache.spark.sql.SparkSession
import graft.sources.ArtifactStore

/** Unit contract of the shared stored-artifact protocol
  * (graft.sources.ArtifactStore) — the commit/resolve/GC semantics the
  * ANN index and the d27 corpus artifacts both ride on. IndexRaceSpec
  * stress-covers the end-to-end concurrency; this spec pins the
  * individual crash/corruption states deterministically.
  */
class ArtifactStoreSpec extends SparkSpec {

  private val RootKey = "spark.graft.artifactDir"

  private def session(root: String): SparkSession = {
    val s = spark.newSession()
    s.conf.set(RootKey, "file:" + root)
    s
  }

  private def writeRange(s: SparkSession, n: Int)(path: String): Unit =
    s.range(n).toDF("id").write.mode("overwrite").parquet(path)

  describe("ArtifactStore.getOrBuild") {

    it("builds once, then resolves without rebuilding") {
      withScratchDir("graft_as_basic") { root =>
        val s = session(root)
        var builds = 0
        def get() = ArtifactStore.getOrBuild(s, RootKey, "art_a") { p =>
          builds += 1; writeRange(s, 100)(p)
        }
        assert(get().count() == 100)
        assert(get().count() == 100)
        assert(builds == 1, s"expected one build, got $builds")
        // pointer file exists and names a live version dir
        val ptr = new java.io.File(root, "art_a.ptr")
        assert(ptr.exists(), "no pointer published")
        val target = new String(java.nio.file.Files.readAllBytes(ptr.toPath), "UTF-8").trim
        assert(new java.io.File(new java.io.File(root, target), "_SUCCESS").exists())
      }
    }

    it("isLive/anyPointer: pure probes — never build, agree with the resolve states") {
      withScratchDir("graft_as_live") { root =>
        val s = session(root)
        // cold root: both probes false, nothing created
        assert(!ArtifactStore.isLive(s, RootKey, "probe_x_00ff"))
        assert(!ArtifactStore.anyPointer(s, RootKey, "probe_x_*"))
        assert(!new java.io.File(root, "probe_x_00ff.ptr").exists())
        // built artifact: both true (exact name and the derived-component
        // glob the warm hooks use)
        ArtifactStore.getOrBuild(s, RootKey, "probe_x_00ff")(writeRange(s, 5))
        assert(ArtifactStore.isLive(s, RootKey, "probe_x_00ff"))
        assert(ArtifactStore.anyPointer(s, RootKey, "probe_x_*"))
        assert(!ArtifactStore.anyPointer(s, RootKey, "probe_y_*"))
        // torn pointer: anyPointer (presence-only) still true, isLive
        // (validating) false — exactly the warm-hook division of labor
        val ptr = new java.io.File(root, "probe_x_00ff.ptr")
        val name = new String(java.nio.file.Files.readAllBytes(ptr.toPath), "UTF-8").trim
        java.nio.file.Files.write(ptr.toPath, name.getBytes("UTF-8")) // no newline
        assert(ArtifactStore.anyPointer(s, RootKey, "probe_x_*"))
        assert(!ArtifactStore.isLive(s, RootKey, "probe_x_00ff"))
        // pointee missing its _SUCCESS marker: isLive false
        java.nio.file.Files.write(ptr.toPath, (name + "\n").getBytes("UTF-8"))
        assert(ArtifactStore.isLive(s, RootKey, "probe_x_00ff"))
        assert(new java.io.File(new java.io.File(root, name), "_SUCCESS").delete())
        assert(!ArtifactStore.isLive(s, RootKey, "probe_x_00ff"))
      }
    }

    it("a torn pointer (no newline terminator) reads as absent and self-heals") {
      withScratchDir("graft_as_torn") { root =>
        val s = session(root)
        ArtifactStore.getOrBuild(s, RootKey, "art_b")(writeRange(s, 50))
        val ptr = new java.io.File(root, "art_b.ptr")
        val name = new String(java.nio.file.Files.readAllBytes(ptr.toPath), "UTF-8").trim
        java.nio.file.Files.write(ptr.toPath, name.getBytes("UTF-8")) // strip terminator
        var rebuilt = false
        val df = ArtifactStore.getOrBuild(s, RootKey, "art_b") { p =>
          rebuilt = true; writeRange(s, 50)(p)
        }
        assert(rebuilt, "torn pointer must trigger a rebuild")
        assert(df.count() == 50)
        // the re-commit repaired the pointer
        val healed = new String(java.nio.file.Files.readAllBytes(ptr.toPath), "UTF-8")
        assert(healed.endsWith("\n"), "re-commit did not restore the validity terminator")
      }
    }

    it("a pointer naming a _SUCCESS-less dir reads as absent; stale GC collects the leftover") {
      withScratchDir("graft_as_poison") { root =>
        val s = session(root)
        s.conf.set("spark.graft.artifact.staleMs", "0")
        ArtifactStore.getOrBuild(s, RootKey, "art_c")(writeRange(s, 10))
        val ptr = new java.io.File(root, "art_c.ptr")
        val first = new String(java.nio.file.Files.readAllBytes(ptr.toPath), "UTF-8").trim
        new java.io.File(new java.io.File(root, first), "_SUCCESS").delete()
        assert(ArtifactStore.getOrBuild(s, RootKey, "art_c")(writeRange(s, 10)).count() == 10)
        val healedName = new String(java.nio.file.Files.readAllBytes(ptr.toPath), "UTF-8").trim
        assert(healedName != first, "pointer still names the poisoned dir")
        assert(!new java.io.File(root, first).exists(), "stale poisoned dir not collected")
      }
    }

    it("stale GC never collects the live (referenced) version even at staleMs=0") {
      withScratchDir("graft_as_gc") { root =>
        val s = session(root)
        s.conf.set("spark.graft.artifact.staleMs", "0")
        ArtifactStore.getOrBuild(s, RootKey, "art_d")(writeRange(s, 25))
        // resolve again (runs GC with everything "stale"): live dir survives
        assert(ArtifactStore.getOrBuild(s, RootKey, "art_d")(writeRange(s, 25)).count() == 25)
        val versions = new java.io.File(root).listFiles()
          .filter(f => f.isDirectory && f.getName.startsWith("art_d_v_"))
        assert(versions.length == 1, s"live version collected or duplicated: ${versions.map(_.getName).toSeq}")
      }
    }

    it("two in-process racers both read complete content; one version wins") {
      withScratchDir("graft_as_race") { root =>
        val s1 = session(root)
        val s2 = session(root)
        val start = new CountDownLatch(1)
        val pool = Executors.newFixedThreadPool(2)
        try {
          val futs = Seq(s1, s2).map { s =>
            pool.submit { () =>
              start.await()
              ArtifactStore.getOrBuild(s, RootKey, "art_e")(writeRange(s, 1000)).count(): Long
            }
          }
          start.countDown()
          val counts = futs.map(_.get(120, TimeUnit.SECONDS))
          assert(counts == Seq(1000L, 1000L), s"incomplete read under race: $counts")
        } finally pool.shutdownNow()
        val ptr = new java.io.File(root, "art_e.ptr")
        assert(ptr.exists(), "no pointer after race")
        val target = new String(java.nio.file.Files.readAllBytes(ptr.toPath), "UTF-8").trim
        assert(new java.io.File(new java.io.File(root, target), "_SUCCESS").exists(),
          "winner target incomplete")
      }
    }

    it("a dead digest's pointer and versions age out; a sibling live digest survives") {
      // regenerated source data yields a new digest; the OLD digest's
      // artifacts are never resolved again and must not grow the root
      // forever. The sweep keys on pointer idleness (every resolve
      // touches the pointer), so a different-but-live digest of the same
      // family — another SF's corpus — is never collected.
      withScratchDir("graft_as_orphan") { root =>
        val s = session(root)
        val dead = "fam_" + "a" * 16   // digest-shaped suffix
        val live = "fam_" + "b" * 16
        ArtifactStore.getOrBuild(s, RootKey, dead)(writeRange(s, 5))
        ArtifactStore.getOrBuild(s, RootKey, live)(writeRange(s, 7))
        // age the dead digest's pointer + version past the orphan horizon
        val deadPtr = new java.io.File(root, s"$dead.ptr")
        val deadV = new java.io.File(root).listFiles()
          .filter(f => f.isDirectory && f.getName.startsWith(s"${dead}_v_"))
        (deadPtr +: deadV.toSeq).foreach(f => assert(f.setLastModified(1000L)))
        s.conf.set("spark.graft.artifact.orphanMs", "60000")
        // any same-family resolve runs the sweep
        assert(ArtifactStore.getOrBuild(s, RootKey, live)(writeRange(s, 7)).count() == 7)
        assert(!deadPtr.exists(), "dead digest's pointer not collected")
        assert(new java.io.File(root).listFiles()
          .forall(f => !f.getName.startsWith(s"${dead}_v_")), "dead digest's version not collected")
        // the live sibling (just resolved → freshly touched) is intact
        assert(new java.io.File(root, s"$live.ptr").exists(), "live sibling's pointer collected")
        assert(ArtifactStore.getOrBuild(s, RootKey, live)(writeRange(s, 7)).count() == 7)
      }
    }

    it("a recently-USED but old pointer is never swept: resolves touch it") {
      withScratchDir("graft_as_touch") { root =>
        val s = session(root)
        val a = "tch_" + "c" * 16
        ArtifactStore.getOrBuild(s, RootKey, a)(writeRange(s, 3))
        val ptr = new java.io.File(root, s"$a.ptr")
        assert(ptr.setLastModified(1000L))
        // resolving the artifact itself refreshes the usage marker
        assert(ArtifactStore.getOrBuild(s, RootKey, a)(writeRange(s, 3)).count() == 3)
        assert(ptr.lastModified() > 1000L, "resolve did not touch the pointer usage marker")
      }
    }

    it("resolves touch the VERSION DIR too, so a live version survives the sweep even if its pointer is momentarily absent") {
      // the race the dir-mtime marker closes: a committer mid
      // delete+rename leaves the pointer briefly missing while the
      // version dir is old-by-mtime (only pointers used to be touched) —
      // a sibling's sweep must not collect the live version
      withScratchDir("graft_as_dirtouch") { root =>
        val s = session(root)
        val live = "rc_" + "d" * 16
        val other = "rc_" + "e" * 16
        ArtifactStore.getOrBuild(s, RootKey, live)(writeRange(s, 4))
        ArtifactStore.getOrBuild(s, RootKey, other)(writeRange(s, 6))
        val liveV = new java.io.File(root).listFiles()
          .filter(f => f.isDirectory && f.getName.startsWith(s"${live}_v_"))
        assert(liveV.nonEmpty)
        // a resolve refreshes the dir mtime — so this aging only sticks
        // if the fix were reverted
        liveV.foreach(f => assert(f.setLastModified(1000L)))
        assert(ArtifactStore.getOrBuild(s, RootKey, live)(writeRange(s, 4)).count() == 4)
        assert(liveV.forall(_.lastModified() > 1000L),
          "resolve did not refresh the version dir's usage marker")
        // now simulate the pointer-absent window with an aged dir: even
        // then the sweep must not collect it within the orphan horizon
        val ptr = new java.io.File(root, s"$live.ptr")
        val ptrBytes = java.nio.file.Files.readAllBytes(ptr.toPath)
        assert(ptr.delete())
        s.conf.set("spark.graft.artifact.orphanMs", "60000")
        assert(ArtifactStore.getOrBuild(s, RootKey, other)(writeRange(s, 6)).count() == 6)
        assert(liveV.forall(_.exists()),
          "sweep collected a recently-used version during its pointer's commit window")
        java.nio.file.Files.write(ptr.toPath, ptrBytes)
        assert(ArtifactStore.getOrBuild(s, RootKey, live)(writeRange(s, 4)).count() == 4)
      }
    }

    it("sweepLegacyNames ages out a renamed family's old names and nothing else") {
      withScratchDir("graft_as_legacy") { root =>
        val s = session(root)
        val current = "ren_9_" + "f" * 16
        ArtifactStore.getOrBuild(s, RootKey, current)(writeRange(s, 5))
        // plant a legacy-named pointer + version dir (digest-only form)
        val legacyBase = "ren_" + "a" * 16
        val legacyV = new java.io.File(root, s"${legacyBase}_v_deadbeef")
        assert(legacyV.mkdir())
        val legacyPtr = new java.io.File(root, s"$legacyBase.ptr")
        java.nio.file.Files.write(legacyPtr.toPath, s"${legacyBase}_v_deadbeef\n".getBytes)
        Seq(legacyV, legacyPtr).foreach(f => assert(f.setLastModified(1000L)))
        s.conf.set("spark.graft.artifact.orphanMs", "60000")
        ArtifactStore.sweepLegacyNames(s, RootKey, "ren_[0-9a-f]{16}(\\.ptr(\\.tmp\\..*)?|_v_.*)")
        assert(!legacyPtr.exists() && !legacyV.exists(), "legacy names not collected")
        // the current family (nb-prefixed) does not match the regex
        assert(new java.io.File(root, s"$current.ptr").exists())
        assert(ArtifactStore.getOrBuild(s, RootKey, current)(writeRange(s, 5)).count() == 5)
      }
    }

    it("sweepLegacyNames spares a legacy family an old-release process still serves (fresh pointer)") {
      withScratchDir("graft_as_legacy2") { root =>
        val s = session(root)
        // old-release usage pattern: resolves touch only the POINTER, the
        // version dir's mtime stays at build time — a fresh pointer must
        // protect the whole family
        val servedBase = "rn2_" + "b" * 16
        val servedV = new java.io.File(root, s"${servedBase}_v_cafe0001")
        assert(servedV.mkdir())
        val servedPtr = new java.io.File(root, s"$servedBase.ptr")
        java.nio.file.Files.write(servedPtr.toPath, s"${servedBase}_v_cafe0001\n".getBytes)
        assert(servedV.setLastModified(1000L)) // dir old; pointer fresh
        s.conf.set("spark.graft.artifact.orphanMs", "60000")
        ArtifactStore.sweepLegacyNames(s, RootKey, "rn2_[0-9a-f]{16}(\\.ptr(\\.tmp\\..*)?|_v_.*)")
        assert(servedV.exists() && servedPtr.exists(),
          "sweep collected a family whose pointer is still being used")
      }
    }

    it("sweepSupersededFamily deletes an idle old-tag family in minutes, sparing same-prefix siblings") {
      // the tag-bump case: old tag + current source ⇒ a computable dead
      // digest under the SAME prefix as live siblings — certainty replaces
      // the 7-day orphan horizon, guarded only by short pointer idleness
      withScratchDir("graft_as_supers") { root =>
        val s = session(root)
        val dead = "sup_7_" + "a" * 16
        val sibling = "sup_7_" + "b" * 16
        ArtifactStore.getOrBuild(s, RootKey, dead)(writeRange(s, 5))
        ArtifactStore.getOrBuild(s, RootKey, sibling)(writeRange(s, 6))
        val deadPtr = new java.io.File(root, s"$dead.ptr")
        val deadV = new java.io.File(root).listFiles()
          .filter(f => f.isDirectory && f.getName.startsWith(s"${dead}_v_"))
        (deadPtr +: deadV.toSeq).foreach(f => assert(f.setLastModified(1000L)))
        s.conf.set("spark.graft.artifact.supersededMs", "60000")
        ArtifactStore.sweepSupersededFamily(s, RootKey, dead)
        assert(!deadPtr.exists(), "superseded pointer not collected")
        assert(deadV.forall(!_.exists()), "superseded versions not collected")
        // the live same-prefix sibling is untouched (exact-name sweep)
        assert(new java.io.File(root, s"$sibling.ptr").exists())
        assert(ArtifactStore.getOrBuild(s, RootKey, sibling)(writeRange(s, 6)).count() == 6)
      }
    }

    it("sweepSupersededFamily spares a family an old-release binary still resolves (fresh pointer)") {
      withScratchDir("graft_as_supers2") { root =>
        val s = session(root)
        val served = "sup_8_" + "c" * 16
        ArtifactStore.getOrBuild(s, RootKey, served)(writeRange(s, 4))
        // pointer mtime is now-fresh (just resolved) — mixed-version guard
        s.conf.set("spark.graft.artifact.supersededMs", "60000")
        ArtifactStore.sweepSupersededFamily(s, RootKey, served)
        assert(new java.io.File(root, s"$served.ptr").exists(),
          "sweep collected a family whose pointer is still being used")
        assert(ArtifactStore.getOrBuild(s, RootKey, served)(writeRange(s, 4)).count() == 4)
      }
    }

    it("the usage marker never rewinds a forward-dated (pointerless self-served) tree") {
      withScratchDir("graft_as_fwd") { root =>
        val s = session(root)
        val a = "fwd_" + "c" * 16
        ArtifactStore.getOrBuild(s, RootKey, a)(writeRange(s, 3))
        val v = new java.io.File(root).listFiles()
          .filter(f => f.isDirectory && f.getName.startsWith(s"${a}_v_")).head
        val future = System.currentTimeMillis() + 3600000L
        assert(v.setLastModified(future))
        assert(ArtifactStore.getOrBuild(s, RootKey, a)(writeRange(s, 3)).count() == 3)
        assert(v.lastModified() >= future - 1000L,
          "resolve rewound a forward-dated tree's protective mtime")
      }
    }
  }
}
