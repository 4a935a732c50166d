package graft.expr

/** SQL-semantics tokenization shared by every native text expression.
  *
  * `TextFunctions.tokens` (the HOF/oracle spec) is
  * `split(trim(text), "\\s+")` guarded by `length(trim(text)) == 0` —
  * where SQL `trim` strips SPACES ONLY and SQL `split` keeps trailing
  * empty strings (limit −1). Java's `String.trim` strips all chars
  * ≤ U+0020 and Java's default `split` drops trailing empties, so a text
  * padded with tabs/newlines tokenizes DIFFERENTLY under the naive Java
  * translation (caught by the ScalaCheck property test). This helper
  * reproduces the SQL behavior exactly: leading/trailing-empty tokens
  * after non-space whitespace and all.
  */
object TextTok {
  def tokens(s: String): Array[String] = {
    var i = 0
    var j = s.length
    while (i < j && s.charAt(i) == ' ') i += 1
    while (j > i && s.charAt(j - 1) == ' ') j -= 1
    if (i >= j) Array.empty
    else s.substring(i, j).split("\\s+", -1)
  }
}
