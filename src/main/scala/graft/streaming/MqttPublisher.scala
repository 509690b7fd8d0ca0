package graft.streaming

/** R10 — real MQTT publisher with the reference's exact client semantics
  * (BME680.java:269-286): Eclipse Paho client, in-memory persistence,
  * automatic reconnect, clean session, 10 s connect timeout; QoS and
  * retained flags ride on each [[AlertMessage]] (QoS 0 + retained in the
  * reference, BME680.java:65,169-170).
  *
  * Paho is not on the offline build classpath, so the client is loaded
  * reflectively: this class compiles and ships everywhere, activates
  * when `org.eclipse.paho.client.mqttv3` is present at runtime (check
  * [[MqttPublisher.available]]), and fails fast with a clear message
  * when it is not. Offline tests gate the sink through
  * [[CollectingPublisher]]; deployments drop this in unchanged.
  */
final class MqttPublisher(brokerUrl: String, clientId: String)
    extends AlertPublisher {

  import MqttPublisher._

  @transient private var client: AnyRef = _

  override def connect(): Unit = {
    if (!available)
      throw new IllegalStateException(
        s"$PAHO not on classpath — add the paho dependency or use another AlertPublisher")
    val clientCl = Class.forName(s"$PAHO.MqttClient")
    val persistence = Class.forName(s"$PAHO.persist.MemoryPersistence")
      .getDeclaredConstructor().newInstance()
    client = clientCl
      .getConstructor(classOf[String], classOf[String],
        Class.forName(s"$PAHO.MqttClientPersistence"))
      .newInstance(brokerUrl, clientId, persistence)
      .asInstanceOf[AnyRef]
    val optsCl = Class.forName(s"$PAHO.MqttConnectOptions")
    val opts = optsCl.getDeclaredConstructor().newInstance()
    optsCl.getMethod("setAutomaticReconnect", classOf[Boolean])
      .invoke(opts, java.lang.Boolean.TRUE)
    optsCl.getMethod("setCleanSession", classOf[Boolean])
      .invoke(opts, java.lang.Boolean.TRUE)
    optsCl.getMethod("setConnectionTimeout", classOf[Int])
      .invoke(opts, Integer.valueOf(10))
    clientCl.getMethod("connect", optsCl).invoke(client, opts)
  }

  override def publish(msg: AlertMessage): Unit = {
    val msgCl = Class.forName(s"$PAHO.MqttMessage")
    val m = msgCl.getConstructor(classOf[Array[Byte]])
      .newInstance(msg.payload.getBytes("UTF-8")).asInstanceOf[AnyRef]
    msgCl.getMethod("setQos", classOf[Int])
      .invoke(m, Integer.valueOf(msg.qos))
    msgCl.getMethod("setRetained", classOf[Boolean])
      .invoke(m, java.lang.Boolean.valueOf(msg.retained))
    client.getClass.getMethod("publish", classOf[String], msgCl)
      .invoke(client, msg.topic, m)
  }

  override def close(): Unit =
    if (client != null)
      client.getClass.getMethod("disconnect").invoke(client)
}

object MqttPublisher {
  private val PAHO = "org.eclipse.paho.client.mqttv3"

  /** Whether the paho client is present on this JVM's classpath. */
  def available: Boolean =
    try { Class.forName(s"$PAHO.MqttClient"); true }
    catch { case _: ClassNotFoundException => false }
}
