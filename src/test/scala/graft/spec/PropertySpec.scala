package graft.spec

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.{forAll, propBoolean}

/** ScalaCheck properties for the spec layer (SURVEY.md §5): key conforming is
  * idempotent, fuzzy lookup is spelling-invariant, `$$` escaping round-trips through
  * the placeholder scanner, and whole-match type retention holds for arbitrary
  * env values. */
object PropertySpec extends Properties("spec") {

  private val keyGen: Gen[String] = for {
    head <- Gen.alphaChar
    tail <- Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.const('-'), Gen.const('_')))
  } yield (head :: tail).mkString

  property("snake is idempotent") = forAll(keyGen) { k =>
    Keys.snake(Keys.snake(k)) == Keys.snake(k)
  }

  property("envKey is idempotent") = forAll(keyGen) { k =>
    Keys.envKey(Keys.envKey(k)) == Keys.envKey(k)
  }

  property("snake and envKey agree modulo case") = forAll(keyGen) { k =>
    Keys.envKey(k).toLowerCase == Keys.snake(k)
  }

  /** Random respelling that fuzzy lookup must treat as the same key. */
  private def respell(k: String): Gen[String] =
    Gen.sequence[List[Char], Char](k.toList.map {
      case '-' | '_' => Gen.oneOf('-', '_')
      case c => Gen.oneOf(c.toLower, c.toUpper)
    }).map(_.mkString)

  property("fuzzyGet finds any respelling") = forAll(keyGen) { k =>
    forAll(respell(k)) { k2 =>
      Keys.fuzzyGet(Map(k -> 1), k2).contains(1)
    }
  }

  private val tmpData =
    java.nio.file.Files.createTempDirectory("graft-prop").toString

  private def resolveOne(env: Map[String, EnvValue],
      cmdEnv: Map[String, EnvValue]): Map[String, EnvValue] =
    Placeholders.resolve(
      Job(name = "p", data = tmpData, env = env,
        commands = List(Command(None, "t", cmdEnv))))
      .commands.head.env

  // printable text without placeholder-active characters
  private val litGen: Gen[String] =
    Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.oneOf(' ', '.', ':', '/', '!')))
      .map(_.mkString)

  property("$$-escaped literals round-trip") = forAll(litGen, litGen, litGen) {
    (a, b, c) =>
      val raw = s"$a$$$$$b$$$$$c" // a$$b$$c — escapes, no references
      val r = resolveOne(Map.empty, Map("K" -> EnvValue.Str(raw)))
      r("K") == EnvValue.Str(s"$a$$$b$$$c")
  }

  private val envValGen: Gen[EnvValue] = Gen.oneOf(
    Gen.choose(Long.MinValue, Long.MaxValue).map(EnvValue.IntV),
    Gen.choose(-1e9, 1e9).map(EnvValue.FloatV),
    Gen.oneOf(true, false).map(EnvValue.BoolV),
    litGen.map(EnvValue.Str))

  property("whole-match reference retains the exact value and type") =
    forAll(envValGen) { v =>
      val r = resolveOne(Map("X" -> v), Map("K" -> EnvValue.Str("${job.env.X}")))
      r("K") == v
    }

  property("embedded reference stringifies via render") = forAll(envValGen) { v =>
    val r = resolveOne(Map("X" -> v),
      Map("K" -> EnvValue.Str("a ${job.env.X} b")))
    r("K") == EnvValue.Str(s"a ${v.render} b")
  }

  // ManifestRender quoting soundness: a rendered scalar, parsed back by the same
  // YAML engine the loader uses, must reproduce the original value and type —
  // strings never reparse as booleans/numbers, specials are quoted correctly.
  private val trickyStrGen: Gen[String] = Gen.oneOf(
    litGen,
    Gen.oneOf("true", "false", "null", "yes", "NO", "~", "", " padded ", "-",
      "- item", "a: b", "trailing:", "it's", "\"quoted\"", "# comment", "@host",
      "*star", "&anchor", "[seq]", "{map}", "|pipe", ">fold", "%tag", "?q"),
    Gen.oneOf("42", "-17", "3.14", "1e6", "+0.5", ".5", "0x1f", "00123"))

  property("ManifestRender scalar round-trips through snakeyaml") =
    forAll(Gen.oneOf(
      trickyStrGen.map(EnvValue.Str): Gen[EnvValue],
      envValGen)) { v =>
      val parsed = new org.yaml.snakeyaml.Yaml()
        .load[Any](s"k: ${ManifestRender.scalar(v)}")
        .asInstanceOf[java.util.Map[String, Any]].get("k")
      v match {
        case EnvValue.Str(s) => parsed == s
        case EnvValue.BoolV(b) => parsed == b
        case EnvValue.IntV(i) =>
          EnvValue(parsed) == EnvValue.IntV(i)
        case EnvValue.FloatV(f) =>
          EnvValue(parsed) match {
            case EnvValue.FloatV(g) => g == f
            case EnvValue.IntV(g) => g.toDouble == f // 1.0 may parse integral
            case _ => false
          }
        case EnvValue.NullV => parsed == null
      }
    }

  // --- round-11 resolver laws (single-pass declaration-order semantics) -----

  /** VectorMap-ordered env with unique upper-snake keys. */
  private val orderedEnvGen: Gen[List[(String, String)]] = for {
    n <- Gen.choose(2, 6)
    keys <- Gen.listOfN(n, keyGen).map(_.map(Keys.envKey).distinct)
    vals <- Gen.listOfN(keys.length, litGen)
  } yield keys.zip(vals)

  private def orderedResolve(entries: List[(String, EnvValue)]): Map[String, EnvValue] =
    Placeholders.resolve(
      Job(name = "p", data = tmpData,
        commands = List(Command(None, "t",
          scala.collection.immutable.VectorMap.from(entries)))))
      .commands.head.env

  property("earlier entries are seen RESOLVED by later references") =
    forAll(orderedEnvGen.suchThat(_.length >= 2), litGen) { (kvs, base) =>
      // A -> literal; every later entry chains to its predecessor. Single-pass
      // order means the chain fully collapses front-to-back.
      val names = kvs.map(_._1)
      val entries = names.zipWithIndex.map { case (k, i) =>
        if (i == 0) k -> EnvValue.Str(base)
        else k -> EnvValue.Str("${" + names(i - 1) + "}")
      }
      val r = orderedResolve(entries)
      names.forall(n => r(n) == EnvValue.Str(base))
    }

  property("references to LATER entries substitute the raw text, once") =
    forAll(keyGen, keyGen, litGen) { (a0, b0, v) =>
      val a = Keys.envKey("A" + a0); val b = Keys.envKey("B" + b0)
      (a != b) ==> {
        // A references B (declared later): A receives B's CURRENT (raw)
        // value at A's turn — which for a literal-valued B equals v — and
        // B itself resolves to v afterwards (test_job.py:471-501 semantics;
        // the single substitution is not rescanned)
        val r = orderedResolve(List(
          a -> EnvValue.Str("${" + b + "}"),
          b -> EnvValue.Str(v)))
        r(a) == EnvValue.Str(v) && r(b) == EnvValue.Str(v)
      }
    }

  property("self-reference is a fixed point (raw text survives)") =
    forAll(keyGen) { k0 =>
      val k = Keys.envKey("S" + k0)
      val raw = "${" + k + "}"
      val r = orderedResolve(List(k -> EnvValue.Str(raw)))
      r(k) == EnvValue.Str(raw)
    }

  property("resolution is insensitive to UNREFERENCED entry values") =
    forAll(orderedEnvGen.suchThat(_.length >= 3), litGen) { (kvs, v2) =>
      // changing a never-referenced entry's value cannot change any other
      // resolved value (no hidden cross-talk in the single-pass state)
      val names = kvs.map(_._1)
      val entries = names.map(k => k -> EnvValue.Str(kvs.toMap.apply(k)))
        .map { case (k, ev) => k -> (ev: EnvValue) }
      val mutated = entries.updated(entries.length - 1,
        entries.last._1 -> (EnvValue.Str(v2): EnvValue))
      val r1 = orderedResolve(entries).removed(entries.last._1)
      val r2 = orderedResolve(mutated).removed(entries.last._1)
      r1 == r2
    }

}
