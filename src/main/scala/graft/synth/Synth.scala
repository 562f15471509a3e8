package graft.synth

/**
 * Pure, seeded (splitmix64) generators for the synthetic Common-Crawl-style
 * corpus (FIXTURES.md §1). Every function is a total function of
 * (seed, ids) — no wall clock, no RNG state — so the same config yields a
 * byte-identical corpus on any executor count (FIXTURES.md determinism
 * requirement; no external data per BASELINE.json).
 *
 * Corpus shape: `cfg.nHosts` hosts; host 0 is deliberately hot (~hotFrac of
 * all pages) to exercise the salted politeness rank (SURVEY.md §4 skew
 * kill). Each host's pages form a closed fanout tree (plus pagination and
 * a few cross-host edges from roots) so BFS from the seed list reaches a
 * deterministic set.
 */
final case class SynthConfig(
    nPages: Long = 10000L,
    nHosts: Int = 20,
    hotFrac: Double = 0.5,
    fanout: Int = 8,
    seed: Long = 42L) {
  val hotPages: Long = (nPages * hotFrac).toLong
  val coldHosts: Int = math.max(nHosts - 1, 1)
  val coldPages: Long = nPages - hotPages
  /** pages on host h */
  def hostPages(h: Int): Long =
    if (h == 0) hotPages
    else coldPages / coldHosts + (if (h <= (coldPages % coldHosts)) 1L else 0L)
  /** global page id → (host, local index); host 0 first, then round-robin */
  def hostOf(id: Long): (Int, Long) =
    if (id < hotPages) (0, id)
    else {
      val r = id - hotPages
      (1 + (r % coldHosts).toInt, r / coldHosts)
    }
  def idOf(host: Int, local: Long): Long =
    if (host == 0) local else hotPages + (local * coldHosts) + (host - 1)
}

object Synth {

  /** splitmix64 — the only mixing primitive used anywhere in synth. */
  def mix(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }
  def mix2(a: Long, b: Long): Long = mix(mix(a) ^ b)

  def hostName(h: Int): String =
    if (h == 0) "big.example.com" else f"h$h%03d.example.com"

  private val cities = Array("Springfield", "Riverton", "Lakewood", "Fairview",
    "Burlington", "Georgetown", "Clinton", "Madison", "Ashland", "Dover")
  private val states = Array("KS", "TX", "CA", "NY", "FL", "OH", "WA", "CO", "GA", "IL")
  private val langs = Array("en", "en", "en", "es", "de", "fr", "zh")
  private val services = Array("Skilled Nursing", "Rehabilitation", "Memory Care",
    "Assisted Living", "Physical Therapy", "Hospice", "Respite Care")

  /** page category: 0..5 facility-ish (cards present), 6 listing, 7 about,
    * 8 news, 9 careers — chosen to exercise every scorer branch
    * (/root/reference/url_scorer.py:26-44 patterns). */
  def category(h: Int, i: Long): Int =
    if (i == 0) 6 else (math.floorMod(mix2(h.toLong * 7919L, i), 10)).toInt

  def pathOf(h: Int, i: Long): String = {
    if (i == 0) return "/"
    category(h, i) match {
      case 0 | 1 | 2 => s"/locations/city-$i/"
      case 3 | 4     => s"/facilities/f-$i"
      case 5         => s"/communities/c-$i/"
      case 6         => s"/our-locations/page-$i"
      case 7         => s"/about/team-$i"
      case 8         => s"/news/item-$i"
      case _         => s"/careers/job-$i"
    }
  }

  def urlOf(cfg: SynthConfig, id: Long): String = {
    val (h, i) = cfg.hostOf(id)
    "https://" + hostName(h) + pathOf(h, i)
  }

  /** Outlink target *local* indices from page (h,i): fanout tree + one
    * pagination edge; deterministic, closed within host. */
  def outlinks(cfg: SynthConfig, h: Int, i: Long): Seq[Long] = {
    val n = cfg.hostPages(h)
    val f = cfg.fanout
    val kids = (0 until f).map(j => i * f + j + 1).filter(_ < n)
    val pag = if (i + 1 < n && category(h, i) == 6) Seq(i + 1) else Seq.empty
    (kids ++ pag).distinct
  }

  /** Cross-host edges: each host root links to two other host roots, so a
    * single seed reaches the whole corpus. */
  def crossHostLinks(cfg: SynthConfig, h: Int, i: Long): Seq[String] =
    if (i != 0 || cfg.nHosts <= 1) Seq.empty
    else Seq((h + 1) % cfg.nHosts, (h + 7) % cfg.nHosts).distinct.filter(_ != h)
      .map(t => "https://" + hostName(t) + "/")

  /** Render an href for target (h,ti) in a deterministically "dirty" form —
    * all variants canonicalize+resolve to the same canonical url, which is
    * what makes the URL-seen set exercise real (SURVEY.md C2/C3). */
  def dirtyHref(cfg: SynthConfig, h: Int, ti: Long, salt: Long): String = {
    val path = pathOf(h, ti)
    math.floorMod(mix2(salt, ti), 5) match {
      case 0 => path                                          // absolute path
      case 1 => "https://" + hostName(h) + path               // absolute url
      case 2 => path + "#section-" + math.floorMod(mix(ti), 7) // fragment
      case 3 => "HTTPS://" + hostName(h).toUpperCase + (if (h == 0) ":443" else "") + path
      case _ => "/." + path                                   // dot segment
    }
  }

  def phoneOf(h: Int, i: Long): String = {
    val a = 200 + math.floorMod(mix2(h.toLong, i * 3 + 1), 700)
    val b = 200 + math.floorMod(mix2(h.toLong, i * 3 + 2), 700)
    val c = 1000 + math.floorMod(mix2(h.toLong, i * 3 + 3), 9000)
    f"($a%03d) $b%03d-$c%04d"
  }
  def zipOf(h: Int, i: Long): String = f"${10000 + math.floorMod(mix2(h.toLong * 13L, i), 89999)}%05d"
  def cityOf(h: Int, i: Long): String = cities(math.floorMod(mix2(h.toLong * 17L, i), cities.length).toInt)
  def stateOf(h: Int, i: Long): String = states(math.floorMod(mix2(h.toLong * 19L, i), states.length).toInt)
  def bedsOf(h: Int, i: Long): Int = 40 + math.floorMod(mix2(h.toLong * 23L, i), 200).toInt
  def nameOf(h: Int, i: Long): String =
    s"Care Center ${cityOf(h, i)} $i"

  /** Facility-card HTML block — field values round-trip the reference's
    * extraction regexes (/root/reference/config.py:117-125). */
  def facilityCard(h: Int, i: Long): String = {
    val name = nameOf(h, i); val city = cityOf(h, i); val st = stateOf(h, i)
    val zip = zipOf(h, i); val phone = phoneOf(h, i); val beds = bedsOf(h, i)
    val svc1 = services(math.floorMod(mix2(h.toLong * 29L, i), services.length).toInt)
    val svc2 = services(math.floorMod(mix2(h.toLong * 31L, i + 1), services.length).toInt)
    val digits = phone.replaceAll("[^0-9]", "")
    s"""<div class="facility-card" itemscope itemtype="https://schema.org/LocalBusiness">
       |<h2 itemprop="name">$name</h2>
       |<p class="address"><span itemprop="streetAddress">${100 + math.floorMod(mix(i), 900)} Main St.</span>,
       |<span itemprop="addressLocality">$city</span>, <span itemprop="addressRegion">$st</span>
       |<span itemprop="postalCode">$zip</span></p>
       |<p>Phone: <a href="tel:$digits">$phone</a></p>
       |<p>Email: <a href="mailto:info$i@${hostName(h)}">info$i@${hostName(h)}</a></p>
       |<p>Capacity: $beds beds &amp; licensed for skilled care</p>
       |<ul class="services"><li>$svc1</li><li>$svc2</li></ul>
       |</div>""".stripMargin
  }

  def jsonLd(h: Int, i: Long): String =
    s"""<script type="application/ld+json">{"@type":"LocalBusiness","name":"${nameOf(h, i)}","telephone":"${phoneOf(h, i)}","address":{"@type":"PostalAddress","addressLocality":"${cityOf(h, i)}","addressRegion":"${stateOf(h, i)}","postalCode":"${zipOf(h, i)}"}}</script>"""

  /** Full page HTML: head noise (script/style/comment/entities), nav links,
    * optional facility card + JSON-LD, footer. ASCII-only (SURVEY.md §7.4
    * risk 2). */
  def htmlOf(cfg: SynthConfig, id: Long): String = {
    val (h, i) = cfg.hostOf(id)
    val cat = category(h, i)
    val sb = new StringBuilder(2048)
    sb ++= s"""<html><head><title>${nameOf(h, i)} | ${hostName(h)}</title>
              |<style>body { color: #333; }</style>
              |<script>var tracking = ${math.floorMod(mix(id), 1000)};</script>
              |</head><body>
              |<!-- page $id cat $cat -->
              |<nav>""".stripMargin
    val salt = mix2(cfg.seed, id)
    outlinks(cfg, h, i).foreach { ti =>
      sb ++= s"""<a href="${dirtyHref(cfg, h, ti, salt)}">${nameOf(h, ti)}</a> """
    }
    crossHostLinks(cfg, h, i).foreach { u => sb ++= s"""<a href="$u">partner</a> """ }
    sb ++= "</nav>\n"
    if (cat <= 5) { sb ++= facilityCard(h, i); sb ++= "\n"; sb ++= jsonLd(h, i); sb ++= "\n" }
    else if (cat == 6) sb ++= s"<h1>Our Locations &amp; Communities</h1><p>Find a location near you.</p>\n"
    else if (cat == 8) sb ++= s"<article><h1>News item $i</h1><p>Quarterly update ${math.floorMod(mix(i), 4) + 1}.</p></article>\n"
    else sb ++= s"<p>General page $i for ${hostName(h)}.</p>\n"
    sb ++= "<footer>&copy; Example Health</footer></body></html>"
    sb.toString
  }

  def langOf(id: Long): String = langs(math.floorMod(mix2(0x1A46L, id), langs.length).toInt)

  /** Fixed epoch (2025-07-23T00:00:00Z) + deterministic offset — no wall clock. */
  val baseEpochMs: Long = 1753228800000L
  def warcTsMs(id: Long): Long = baseEpochMs + math.floorMod(mix2(0x7157L, id), 86400L) * 1000L
}
