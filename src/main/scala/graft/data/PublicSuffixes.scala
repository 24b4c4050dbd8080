package graft.data

/** Minimal embedded public-suffix snapshot — the multi-label suffixes under
  * which registrations actually happen (`example.co.uk` registers under
  * `co.uk`, not `uk`), so [[TextFunctions.registeredDomain]] can group URLs
  * by the owning registration instead of crediting everything under a
  * country code to one pseudo-domain.
  *
  * Source of truth is the public-suffix list (publicsuffix.org, Mozilla's
  * public dataset); this snapshot carries the ~200 two-label ICP-style
  * suffixes that cover the bulk of real web traffic, not the full list.
  * Known limitation, documented rather than approximated: wildcard city/
  * prefecture rules (`*.nagoya.jp`-style) and rarely-seen three-label
  * suffixes are NOT modeled — those hosts fall back to the two-label rule.
  * The set is a plain literal so the membership test compiles to a Catalyst
  * `In` over the host's last two labels — scan-local, codegen'd, no UDF.
  */
object PublicSuffixes {

  /** Two-label public suffixes: a host ending `.<one of these>` registers
    * one label deeper. Grouped by country for auditability. */
  val twoLabel: Seq[String] = Seq(
    // United Kingdom
    "co.uk", "org.uk", "ac.uk", "gov.uk", "net.uk", "sch.uk", "me.uk",
    "ltd.uk", "plc.uk", "nhs.uk", "police.uk",
    // Australia
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "asn.au", "id.au",
    // New Zealand
    "co.nz", "net.nz", "org.nz", "govt.nz", "ac.nz", "school.nz", "gen.nz",
    "geek.nz", "maori.nz", "iwi.nz",
    // Japan
    "co.jp", "ne.jp", "or.jp", "ac.jp", "ad.jp", "ed.jp", "go.jp", "gr.jp",
    "lg.jp",
    // South Korea
    "co.kr", "ne.kr", "or.kr", "re.kr", "pe.kr", "go.kr", "mil.kr", "ac.kr",
    "hs.kr", "ms.kr", "es.kr", "sc.kr", "kg.kr", "seoul.kr", "busan.kr",
    // China
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn", "ac.cn", "mil.cn",
    // Taiwan
    "com.tw", "net.tw", "org.tw", "edu.tw", "gov.tw", "idv.tw",
    // Hong Kong
    "com.hk", "net.hk", "org.hk", "edu.hk", "gov.hk", "idv.hk",
    // Singapore
    "com.sg", "net.sg", "org.sg", "edu.sg", "gov.sg", "per.sg",
    // Malaysia
    "com.my", "net.my", "org.my", "edu.my", "gov.my", "mil.my", "name.my",
    // Indonesia
    "co.id", "net.id", "or.id", "web.id", "sch.id", "ac.id", "go.id",
    "mil.id", "my.id", "biz.id",
    // Thailand
    "co.th", "net.th", "or.th", "ac.th", "go.th", "in.th", "mi.th",
    // Vietnam
    "com.vn", "net.vn", "org.vn", "edu.vn", "gov.vn", "int.vn", "ac.vn",
    "biz.vn", "info.vn", "name.vn", "pro.vn", "health.vn",
    // Philippines
    "com.ph", "net.ph", "org.ph", "edu.ph", "gov.ph", "ngo.ph", "mil.ph",
    // India
    "co.in", "net.in", "org.in", "firm.in", "gen.in", "ind.in", "nic.in",
    "ac.in", "edu.in", "res.in", "gov.in", "mil.in",
    // Pakistan
    "com.pk", "net.pk", "org.pk", "edu.pk", "gov.pk",
    // Bangladesh
    "com.bd", "net.bd", "org.bd", "edu.bd", "gov.bd", "ac.bd",
    // Israel
    "co.il", "net.il", "org.il", "ac.il", "gov.il", "k12.il", "muni.il",
    "idf.il",
    // Turkey
    "com.tr", "net.tr", "org.tr", "edu.tr", "gov.tr", "mil.tr", "av.tr",
    "bel.tr", "biz.tr", "dr.tr", "gen.tr", "info.tr", "k12.tr", "name.tr",
    "pol.tr", "tel.tr", "tv.tr", "web.tr",
    // Saudi Arabia / UAE / Egypt
    "com.sa", "net.sa", "org.sa", "edu.sa", "gov.sa", "med.sa", "pub.sa",
    "sch.sa",
    "com.ae", "net.ae", "org.ae", "ac.ae", "gov.ae", "mil.ae", "sch.ae",
    "com.eg", "net.eg", "org.eg", "edu.eg", "gov.eg", "sci.eg",
    // Ukraine / Russia-adjacent ccTLD conventions
    "com.ua", "net.ua", "org.ua", "edu.ua", "gov.ua", "in.ua",
    "com.ru", "net.ru", "org.ru", "msk.ru", "spb.ru",
    // Poland
    "com.pl", "net.pl", "org.pl", "edu.pl", "gov.pl", "info.pl", "waw.pl",
    // Brazil
    "com.br", "net.br", "org.br", "gov.br", "edu.br", "mil.br", "art.br",
    "blog.br", "eco.br", "eng.br", "esp.br", "far.br", "imb.br", "ind.br",
    "inf.br", "jus.br", "leg.br", "med.br", "mp.br", "tv.br",
    // Mexico
    "com.mx", "net.mx", "org.mx", "edu.mx", "gob.mx",
    // Argentina
    "com.ar", "net.ar", "org.ar", "edu.ar", "gob.ar", "gov.ar", "int.ar",
    "mil.ar", "tur.ar",
    // Colombia / Peru / Venezuela / Ecuador / Uruguay / Paraguay / Bolivia
    "com.co", "net.co", "org.co", "edu.co", "gov.co", "mil.co", "nom.co",
    "com.pe", "net.pe", "org.pe", "edu.pe", "gob.pe", "mil.pe", "nom.pe",
    "com.ve", "net.ve", "org.ve", "co.ve", "edu.ve", "gob.ve",
    "com.ec", "net.ec", "org.ec", "edu.ec", "gob.ec",
    "com.uy", "net.uy", "org.uy", "edu.uy", "gub.uy",
    "com.py", "net.py", "org.py", "edu.py", "gov.py",
    "com.bo", "net.bo", "org.bo", "edu.bo", "gob.bo",
    // South Africa & Sub-Saharan Africa
    "co.za", "net.za", "org.za", "gov.za", "edu.za", "ac.za", "web.za",
    "co.ke", "or.ke", "ne.ke", "go.ke", "ac.ke", "sc.ke", "me.ke",
    "com.ng", "net.ng", "org.ng", "edu.ng", "gov.ng", "co.ng", "sch.ng",
    "com.gh", "edu.gh", "gov.gh", "org.gh",
    "co.tz", "or.tz", "ac.tz", "go.tz",
    "co.ug", "or.ug", "ac.ug", "go.ug",
    "co.zw", "org.zw", "ac.zw", "gov.zw",
    "co.bw", "org.bw",
    "co.mz", "org.mz", "gov.mz",
    "com.et", "org.et", "edu.et", "gov.et")

  private val set: Set[String] = twoLabel.toSet

  /** True when registrations under this two-label suffix go one label
    * deeper (`isSuffix("co.uk")` — so `example.co.uk`, not `co.uk`, is the
    * registered domain). */
  def isSuffix(lastTwoLabels: String): Boolean = set(lastTwoLabels)
}
