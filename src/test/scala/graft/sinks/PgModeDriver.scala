package graft.sinks

import java.lang.reflect.{InvocationHandler, InvocationTargetException, Method, Proxy}
import java.sql.{Connection, DriverManager, SQLException, Statement}
import java.util.Properties
import java.util.concurrent.atomic.AtomicBoolean
import java.util.logging.Logger

/** Test-only JDBC driver emulating the PostgreSQL transaction semantics
  * that embedded Derby does NOT share: after ANY statement error inside
  * an open transaction, PostgreSQL puts the transaction in the aborted
  * state (SQLSTATE 25P02 — "current transaction is aborted, commands
  * ignored until end of transaction block") and every further statement
  * fails until the client rolls back; `COMMIT` on an aborted
  * transaction succeeds but performs a rollback. Derby instead rolls
  * back only the failed STATEMENT and lets the transaction continue —
  * so a sink whose error handling is only Derby-exercised could pass
  * its suites while violating the discipline a real `postgres` target
  * (the reference's production sink, setup.py:85) demands.
  *
  * `jdbc:pgmode:<db>` delegates storage to `jdbc:derby:memory:<db>`
  * through dynamic proxies that add exactly that state machine:
  *  - statement failure with autocommit OFF marks the connection
  *    aborted (autocommit ON is per-statement, as in PostgreSQL);
  *  - while aborted, every execute/addBatch throws SQLSTATE 25P02;
  *  - rollback() clears the abort; commit() on an aborted transaction
  *    rolls back (PostgreSQL's documented COMMIT behavior).
  */
object PgModeDriver {
  val Prefix = "jdbc:pgmode:"
  private val registered = new AtomicBoolean(false)

  def register(): Unit =
    if (registered.compareAndSet(false, true))
      DriverManager.registerDriver(new PgModeDriver)

  private[sinks] def wrapConnection(delegate: Connection): Connection = {
    val aborted = new AtomicBoolean(false)

    def abortedEx() = new SQLException(
      "ERROR: current transaction is aborted, commands ignored until " +
        "end of transaction block", "25P02")

    def wrapStatement[S <: Statement](st: S, iface: Class[_]): S =
      Proxy.newProxyInstance(st.getClass.getClassLoader, Array(iface),
        new InvocationHandler {
          override def invoke(p: Any, m: Method, args: Array[AnyRef]): AnyRef = {
            val executes = m.getName.startsWith("execute") ||
              m.getName == "addBatch"
            if (executes && aborted.get()) throw abortedEx()
            try m.invoke(st, args: _*)
            catch {
              case e: InvocationTargetException =>
                e.getCause match {
                  case sql: SQLException =>
                    if (executes && !delegate.getAutoCommit) aborted.set(true)
                    throw sql
                  case other => throw other
                }
            }
          }
        }).asInstanceOf[S]

    Proxy.newProxyInstance(delegate.getClass.getClassLoader,
      Array(classOf[Connection]),
      new InvocationHandler {
        override def invoke(p: Any, m: Method, args: Array[AnyRef]): AnyRef =
          try m.getName match {
            case "rollback" =>
              aborted.set(false); m.invoke(delegate, args: _*)
            case "commit" if aborted.getAndSet(false) =>
              delegate.rollback(); null // pg: COMMIT on aborted txn = ROLLBACK
            case "createStatement" =>
              wrapStatement(m.invoke(delegate, args: _*)
                .asInstanceOf[Statement], classOf[Statement])
            case "prepareStatement" =>
              wrapStatement(m.invoke(delegate, args: _*)
                .asInstanceOf[java.sql.PreparedStatement],
                classOf[java.sql.PreparedStatement])
            case _ => m.invoke(delegate, args: _*)
          } catch {
            case e: InvocationTargetException => throw e.getCause
          }
      }).asInstanceOf[Connection]
  }
}

class PgModeDriver extends java.sql.Driver {
  override def acceptsURL(url: String): Boolean =
    url != null && url.startsWith(PgModeDriver.Prefix)

  override def connect(url: String, info: Properties): Connection =
    if (!acceptsURL(url)) null
    else PgModeDriver.wrapConnection(DriverManager.getConnection(
      "jdbc:derby:memory:" + url.stripPrefix(PgModeDriver.Prefix) +
        ";create=true"))

  override def getPropertyInfo(url: String, info: Properties) =
    Array.empty[java.sql.DriverPropertyInfo]
  override def getMajorVersion: Int = 1
  override def getMinorVersion: Int = 0
  override def jdbcCompliant(): Boolean = false
  override def getParentLogger: Logger =
    throw new java.sql.SQLFeatureNotSupportedException
}
