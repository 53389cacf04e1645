package graft.functions

/** Built-in bounded dictionaries (reference `orchestrator/clickhouse/data/`
  * serves these as CSVs for ClickHouse dictionaries; the values are public
  * IANA assignments). Shared by the filter parser (name-form matching),
  * dimension rendering, and widgets.
  */
object Dictionaries {

  /** IANA protocol numbers → names. */
  val protocolNames: Map[Long, String] = Map(
    1L -> "ICMP", 2L -> "IGMP", 4L -> "IPIP", 6L -> "TCP", 17L -> "UDP",
    47L -> "GRE", 50L -> "ESP", 51L -> "AH", 58L -> "ICMPv6", 89L -> "OSPF",
    132L -> "SCTP")

  /** Uppercased name → number, for the filter DSL's `Proto = 'TCP'` form. */
  val protocolNumbers: Map[String, Long] =
    protocolNames.map { case (k, v) => v.toUpperCase -> k }
}
