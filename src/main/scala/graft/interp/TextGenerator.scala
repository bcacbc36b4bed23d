package graft.interp

/** The LLM seam. The reference calls external models (Snowflake Cortex at
  * `/root/reference/Business_Glossory.sql:69-80`; `core.agent` helpers at
  * `CODE_GENERATOR.sql:12-13` — the core.zip artifact is not in the repo),
  * so text generation is an external dependency by construction. The
  * engine implements every DETERMINISTIC part (routing, filtering, prompt
  * assembly, result plumbing) natively and keeps generation behind this
  * trait; tests use [[TextGenerator.Stub]].
  */
trait TextGenerator {
  def generate(prompt: String): String

  /** Metadata-aware variant — the reference hands METADATA to
    * `generate_reply` alongside the prompt
    * (`CODE_GENERATOR.sql:124-134`); generators that don't use it fall
    * back to the prompt-only form.
    */
  def generate(prompt: String, metadata: Objective.Metadata): String =
    generate(prompt)
}

object TextGenerator {

  /** Deterministic stub: echoes a stable digest of the prompt. */
  object Stub extends TextGenerator {
    def generate(prompt: String): String = {
      val head = prompt.trim.linesIterator.toSeq.headOption.getOrElse("")
      s"[generated] ${head.take(120)}"
    }
  }

  /** `clean_sql` equivalent (the reference's lives in core.zip — behavior
    * reconstructed from use: LLMs wrap code in markdown fences; strip them
    * and trim).
    */
  def cleanCode(text: String): String = {
    val t = text.trim
    val fenced = "(?s)^```[a-zA-Z]*\\n(.*?)\\n?```$".r
    t match {
      case fenced(body) => body.trim
      case _ => t
    }
  }
}
