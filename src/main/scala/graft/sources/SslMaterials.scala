package graft.sources

import java.io.ByteArrayInputStream
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}
import java.security.cert.{CertificateFactory, X509Certificate}
import java.security.spec.PKCS8EncodedKeySpec
import java.security.{KeyFactory, KeyStore, PrivateKey}

/** PEM → PKCS12 materialization — the last §2.11 control-plane piece:
  * the reference's deploy env delivers TLS material as PEM *strings*
  * (client cert chain, client private key, trusted CA — reference
  * `main.sh:26-28`), while the JVM Kafka client wants keystore *files*.
  * The reference shells out to openssl (`main.sh:30-33`: PKCS12 keystore
  * named `client` from chain+key, CA left as a PEM truststore,
  * `main.sh:42-48`). Here the same conversion is pure `java.security` —
  * no process spawn, no openssl on the image, and the key bytes never
  * transit a shell environment.
  *
  * Supported key encodings (what openssl emits for the common cases):
  * PKCS#8 (`BEGIN PRIVATE KEY` — RSA/EC/DSA/EdDSA, algorithm
  * auto-detected by trying each KeyFactory), PKCS#1 RSA
  * (`BEGIN RSA PRIVATE KEY` — wrapped into PKCS#8 DER by hand, the
  * 16-byte rsaEncryption AlgorithmIdentifier header), and encrypted
  * PKCS#8 (`BEGIN ENCRYPTED PRIVATE KEY` — decrypted with the key
  * password via `EncryptedPrivateKeyInfo`, covering openssl's PBES2
  * default; the reference's `-passin env:SSL_KEY_PASSWORD`).
  *
  * The truststore stays PEM by design, exactly like the reference
  * (`main.sh:46-47` `SSL_TRUSTSTORE_TYPE=PEM`): kafka-clients ≥ 2.7
  * reads PEM truststores natively, so converting the CA would only add
  * a password to manage. The PEM is still parsed before writing —
  * a corrupt cert should fail the deploy here, not hang the first
  * broker handshake.
  */
object SslMaterials {

  /** Locations + passwords of the materialized stores, in the shape
    * [[KafkaEnvelope.sourceOptions]] consumes. */
  final case class Materials(
      keystoreLocation: String, keystorePassword: String,
      truststoreLocation: String) {
    val keystoreType: String = "PKCS12"
    val truststoreType: String = "PEM"
  }

  /** Materialize the two stores under `dir` (the reference's per-boot
    * mktemp dir, `main.sh:25`): `keystore.p12` (alias `client`, store
    * and key password both `keyPassword` — mirroring openssl's single
    * `-passout`/`-passin` env) and `ca.pem` (verbatim, validated). */
  def materialize(clientCertPem: String, clientKeyPem: String,
      trustedCertPem: String, keyPassword: String, dir: Path): Materials = {
    val chain = parseCertChain(clientCertPem)
    require(chain.nonEmpty, "client cert PEM contains no CERTIFICATE block")
    val key = parsePrivateKey(clientKeyPem, Option(keyPassword).filter(_.nonEmpty))
    require(parseCertChain(trustedCertPem).nonEmpty,
      "trusted cert PEM contains no CERTIFICATE block")
    val ks = KeyStore.getInstance("PKCS12")
    ks.load(null, null)
    ks.setKeyEntry("client", key, keyPassword.toCharArray, chain.toArray)
    Files.createDirectories(dir)
    val ksPath = dir.resolve("keystore.p12")
    val out = Files.newOutputStream(ksPath)
    try ks.store(out, keyPassword.toCharArray) finally out.close()
    val caPath = dir.resolve("ca.pem")
    Files.write(caPath, trustedCertPem.getBytes(StandardCharsets.UTF_8))
    Materials(ksPath.toString, keyPassword, caPath.toString)
  }

  /** `KAFKA_URL` → `bootstrap.servers`: strip every scheme prefix and
    * all whitespace (the reference's sed, `main.sh:38`) —
    * `kafka+ssl://h1:9096,kafka+ssl://h2:9096` → `h1:9096,h2:9096`. */
  def bootstrapServers(kafkaUrl: String): String =
    kafkaUrl.replaceAll("\\s", "")
      .replaceAll("(^|,)[A-Za-z0-9+._-]+://", "$1")

  /** The full env contract in one call — the Spark-side equivalent of
    * `main.sh:25-58`: reads `KAFKA_URL`, `KAFKA_CLIENT_CERT`,
    * `KAFKA_CLIENT_CERT_KEY`, `KAFKA_TRUSTED_CERT`, `SSL_KEY_PASSWORD`,
    * materializes the stores under `dir`, and returns the complete
    * option map for `format("kafka")`, store types and the blank
    * endpoint-identification algorithm included (`main.sh:44-48` — the
    * brokers present per-instance certs whose hostnames don't match the
    * client-facing DNS, so hostname verification must be off, exactly
    * as the reference exports). */
  def kafkaOptions(env: Map[String, String], topics: Seq[String],
      dir: Path, startingOffsets: String = "earliest"): Map[String, String] = {
    def req(k: String): String = env.getOrElse(k,
      throw new IllegalArgumentException(s"missing env var $k"))
    val m = materialize(req("KAFKA_CLIENT_CERT"), req("KAFKA_CLIENT_CERT_KEY"),
      req("KAFKA_TRUSTED_CERT"), req("SSL_KEY_PASSWORD"), dir)
    KafkaEnvelope.sourceOptions(
      bootstrap = bootstrapServers(req("KAFKA_URL")),
      topics = topics,
      sslTruststore = Some(m.truststoreLocation),
      sslKeystore = Some(m.keystoreLocation),
      sslKeyPassword = Some(m.keystorePassword),
      sslKeystorePassword = Some(m.keystorePassword),
      startingOffsets = startingOffsets) ++ Map(
      "kafka.ssl.keystore.type" -> m.keystoreType,
      "kafka.ssl.truststore.type" -> m.truststoreType,
      "kafka.ssl.endpoint.identification.algorithm" -> "")
  }

  /** Every CERTIFICATE block in a PEM string, in order (the JDK
    * CertificateFactory consumes concatenated PEM natively). */
  def parseCertChain(pem: String): Seq[X509Certificate] = {
    val blocks = pemBlocks(pem).filter(_._1 == "CERTIFICATE")
    if (blocks.isEmpty) return Seq.empty
    val cf = CertificateFactory.getInstance("X.509")
    blocks.map { case (_, der) =>
      cf.generateCertificate(new ByteArrayInputStream(der))
        .asInstanceOf[X509Certificate]
    }
  }

  /** Parse one private key from a PEM string (first recognized key
    * block). `password` is only consulted for `ENCRYPTED PRIVATE KEY`
    * blocks. */
  def parsePrivateKey(pem: String, password: Option[String]): PrivateKey = {
    val blocks = pemBlocks(pem)
    val keyBlock = blocks.collectFirst {
      case b @ ("PRIVATE KEY" | "RSA PRIVATE KEY" | "ENCRYPTED PRIVATE KEY", _) => b
    }.getOrElse(throw new IllegalArgumentException(
      s"no private key block in PEM (found: ${blocks.map(_._1).mkString(", ")})"))
    keyBlock match {
      case ("PRIVATE KEY", der) => fromPkcs8(der)
      case ("RSA PRIVATE KEY", der) => fromPkcs8(pkcs1ToPkcs8(der))
      case ("ENCRYPTED PRIVATE KEY", der) =>
        val pw = password.getOrElse(throw new IllegalArgumentException(
          "encrypted private key but no key password supplied"))
        val epki = new javax.crypto.EncryptedPrivateKeyInfo(der)
        val skf = javax.crypto.SecretKeyFactory.getInstance(epki.getAlgName)
        val secret = skf.generateSecret(
          new javax.crypto.spec.PBEKeySpec(pw.toCharArray))
        fromSpec(epki.getKeySpec(secret))
      case (other, _) => throw new IllegalArgumentException(s"unsupported key block $other")
    }
  }

  // ---- internals ----------------------------------------------------

  private def fromPkcs8(der: Array[Byte]): PrivateKey =
    fromSpec(new PKCS8EncodedKeySpec(der))

  /** PKCS#8 carries the algorithm OID, but `KeyFactory` wants its name
    * up front — try the JDK's asymmetric families in likelihood order
    * (a wrong factory rejects the spec, it never mis-parses). */
  private def fromSpec(spec: PKCS8EncodedKeySpec): PrivateKey = {
    val algs = Seq("RSA", "EC", "DSA", "EdDSA")
    algs.iterator.flatMap { a =>
      try Some(KeyFactory.getInstance(a).generatePrivate(spec))
      catch { case scala.util.control.NonFatal(_) => None }
    }.nextOption().getOrElse(throw new IllegalArgumentException(
      s"private key is none of ${algs.mkString("/")}"))
  }

  /** Wrap a PKCS#1 RSAPrivateKey DER in the PKCS#8 envelope:
    * SEQUENCE { INTEGER 0, SEQUENCE { OID rsaEncryption, NULL },
    * OCTET STRING pkcs1 } — the fixed 15-byte AlgorithmIdentifier is
    * spelled out (RFC 8017 A.1). */
  private[sources] def pkcs1ToPkcs8(pkcs1: Array[Byte]): Array[Byte] = {
    val algId: Array[Byte] = Array(0x30, 0x0d, 0x06, 0x09, 0x2a, 0x86, 0x48,
      0x86, 0xf7, 0x0d, 0x01, 0x01, 0x01, 0x05, 0x00).map(_.toByte)
    val version: Array[Byte] = Array(0x02, 0x01, 0x00).map(_.toByte)
    val octet = der(0x04, pkcs1)
    der(0x30, version ++ algId ++ octet)
  }

  /** One DER TLV: tag + definite length + content. */
  private def der(tag: Int, content: Array[Byte]): Array[Byte] = {
    val len =
      if (content.length < 0x80) Array(content.length.toByte)
      else {
        val b = BigInt(content.length).toByteArray.dropWhile(_ == 0)
        (0x80 | b.length).toByte +: b
      }
    tag.toByte +: (len ++ content)
  }

  /** All `-----BEGIN X----- … -----END X-----` blocks as
    * (label, DER bytes), tolerant of surrounding text and CRLF. */
  private def pemBlocks(pem: String): Seq[(String, Array[Byte])] = {
    val rx = ("(?s)-----BEGIN ([A-Z0-9 ]+)-----(.*?)-----END \\1-----").r
    rx.findAllMatchIn(Option(pem).getOrElse("")).map { m =>
      val label = m.group(1)
      val b64 = m.group(2).replaceAll("\\s", "")
      label -> java.util.Base64.getDecoder.decode(b64)
    }.toSeq
  }
}
