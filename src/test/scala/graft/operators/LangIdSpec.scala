package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Real-langid certification: the char-trigram + script model must
  * classify text the marker-word heuristic provably cannot — native
  * Han/Kana/Hangul/Cyrillic script and accented Latin-script prose.
  * None of these sentences appear in the profile seeds. */
class LangIdSpec extends SparkSpec {

  private def predict(rows: Seq[(Long, String)]): Map[Long, String] = {
    import spark.implicits._
    LangId.detect(rows.toDF("doc_id", "text"), "doc_id", "text")
      .select("id", "pred_lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
  }

  test("script detection: Han / Kana / Hangul / Cyrillic") {
    val preds = predict(Seq(
      1L -> "机器学习模型需要大量的训练数据来提高性能,数据质量决定模型上限。",
      2L -> "東京では桜の季節にたくさんの人が公園を訪れます。春はとても美しいです。",
      3L -> "서울은 대한민국의 수도이며 많은 사람들이 살고 있습니다.",
      4L -> "Москва является столицей России и крупнейшим городом страны."))
    assert(preds(1L) == "zh")
    assert(preds(2L) == "ja")
    assert(preds(3L) == "ko")
    assert(preds(4L) == "ru")
  }

  test("the marker heuristic cannot classify native-script text (motivation)") {
    import spark.implicits._
    val df = Seq(
      1L -> "机器学习模型需要大量的训练数据来提高性能。",
      2L -> "Москва является столицей России.").toDF("doc_id", "text")
    val old = TextAnalysis.langId(df, "doc_id", "text")
      .select("id", "pred_lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // romanized markers never fire on native script → everything "und"
    assert(old(1L) == "und" && old(2L) == "und")
  }

  test("trigram profiles separate the six Latin-script languages") {
    val preds = predict(Seq(
      10L -> "The researchers discovered a new species of butterfly in the northern forest last spring.",
      11L -> "Los trabajadores de la fábrica pidieron mejores condiciones y un aumento de sueldo.",
      12L -> "Les élèves étudient à l'école près de la rivière pendant toute la journée d'hiver.",
      13L -> "Die Wissenschaftler haben eine neue Methode für die Untersuchung der Zellen entwickelt.",
      14L -> "Il professore ha spiegato la lezione agli studenti della scuola durante la mattinata.",
      15L -> "Os pescadores saíram muito cedo para o mar e voltaram apenas ao fim da tarde."))
    assert(preds(10L) == "en")
    assert(preds(11L) == "es")
    assert(preds(12L) == "fr")
    assert(preds(13L) == "de")
    assert(preds(14L) == "it")
    assert(preds(15L) == "pt")
  }

  test("degenerate inputs: empty, null, punctuation-only → und") {
    import spark.implicits._
    val df = Seq((1L, ""), (2L, null.asInstanceOf[String]), (3L, "12345 !!! ???"))
      .toDF("doc_id", "text")
    val preds = LangId.detect(df, "doc_id", "text")
      .select("id", "pred_lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(preds.values.forall(_ == "und"))
  }

  test("script detection: Arabic / Devanagari / Thai (round 13)") {
    val preds = predict(Seq(
      5L -> "القاهرة هي عاصمة جمهورية مصر العربية وأكبر مدنها على الإطلاق.",
      6L -> "दिल्ली भारत की राजधानी है और यहाँ बहुत से लोग रहते हैं।",
      7L -> "กรุงเทพมหานครเป็นเมืองหลวงของประเทศไทยและมีประชากรจำนวนมาก"))
    assert(preds(5L) == "ar")
    assert(preds(6L) == "hi")
    assert(preds(7L) == "th")
  }

  test("confusion matrix: all 37 Latin-script languages on held-out text") {
    // none of these sentences appear in the profile seeds; the
    // round-18 additions (af az eu gl ms sq sw) include the
    // adversarial near-neighbor pairs the widening exists for:
    // af-vs-nl, az-vs-tr (a parallel fisherman sentence to the tr
    // row), gl-vs-pt/es, ms-vs-id. Two sentences per new language.
    // Honest limit: gl/pt is the tightest pair — a Galician sentence
    // without any of the orthographic discriminators (x where pt
    // writes j, unha/cunha, mentres) can still label pt; the matrix
    // pins that the discriminators, when present, decide correctly.
    val heldOut: Seq[(String, String)] = Seq(
      "af" -> "Die boer het vroeg opgestaan om die koeie te melk en het daarna brood en koffie vir ontbyt geniet.",
      "af" -> "Die onderwyser het vir die leerders van die sterre vertel terwyl hulle snags deur die teleskoop gekyk het.",
      "az" -> "Balıqçılar səhər tezdən dənizə çıxdılar və axşam kəndə təzə balıqlarla qayıtdılar.",
      "az" -> "Müəllim gecə uşaqlara ulduzlar haqqında danışdı və onlar teleskopla səmaya baxdılar.",
      "eu" -> "Arrantzaleak goizean goiz itsasoratu ziren eta iluntzean arrain freskoekin itzuli ziren herrira.",
      "eu" -> "Irakasleak izarrei buruz hitz egin zien ikasleei, gauez teleskopioaz zerura begiratzen zuten bitartean.",
      "gl" -> "O panadeiro prepara cada noite pan fresco que os veciños mercan pola mañá cedo na praza da vila.",
      "gl" -> "Onte pola tarde os rapaces xogaron na praia e despois mercaron queixo e pan na tenda da vila xunto ao peirao.",
      "ms" -> "Para nelayan keluar ke laut awal pagi lagi dan balik ke kampung dengan ikan segar sebelum senja kerana hendak mengelakkan ribut.",
      "ms" -> "Guru itu bercerita kepada murid-murid tentang bintang kerana mereka hendak melihat langit malam dengan teleskop.",
      "sq" -> "Peshkatarët dolën në det herët në mëngjes dhe u kthyen në fshat me peshq të freskët para mbrëmjes.",
      "sq" -> "Mësuesja u tregoi nxënësve për yjet ndërsa shikonin qiellin e natës me teleskop nga kodra.",
      "sw" -> "Wavuvi walitoka baharini asubuhi na mapema na kurudi kijijini na samaki safi kabla ya giza kuingia.",
      "sw" -> "Mwalimu aliwaambia wanafunzi kuhusu nyota walipokuwa wakitazama anga la usiku kwa darubini.",
      // round-19 additions: tl-vs-ceb is the adversarial Philippine
      // pair (shared vocabulary, distinct function words); uz-vs-az/tr
      // is the Latin-Turkic triple
      "tl" -> "Ang mga mangingisda ay pumalaot nang maagang-maaga at bumalik sa nayon na may sariwang isda bago lumubog ang araw.",
      "tl" -> "Ikinuwento ng guro sa mga mag-aaral ang tungkol sa mga bituin habang nakatingin sila sa langit gamit ang teleskopyo.",
      "uz" -> "Baliqchilar erta tongda dengizga chiqishdi va kechga yaqin qishloqqa yangi baliqlar bilan qaytib kelishdi.",
      "uz" -> "O'qituvchi bolalarga yulduzlar haqida gapirib berdi va ular teleskop orqali tungi osmonga qarashdi.",
      "ceb" -> "Ang mga mangingisda milawod sayo sa buntag ug mibalik sa baryo nga adunay lab-as nga isda sa dili pa mosalop ang adlaw.",
      "ceb" -> "Gisuginlan sa magtutudlo ang mga estudyante bahin sa mga bituon samtang nagtan-aw sila sa langit pinaagi sa teleskopyo.",
      // ha/yo complete the r18-#3 Latin list; both depend on the
      // widened normalization alphabet (hooked consonants, combining
      // tone marks over underdot vowels)
      "ha" -> "Manoma suna shuka hatsi a lokacin damina kuma suna girbi bayan watanni da yawa tare da iyalansu.",
      "ha" -> "Ɗalibai a ɗakin karatu suna shirye-shiryen jarrabawa kuma suna karanta tsofaffin littattafai da wasiƙu.",
      "yo" -> "Àwọn àgbẹ̀ máa ń gbin àgbàdo ní àkókò òjò, wọ́n á sì kórè rẹ̀ lẹ́yìn ọ̀pọ̀ oṣù pẹ̀lú ẹbí wọn.",
      "yo" -> "Àwọn akẹ́kọ̀ọ́ nínú ilé ìkàwé ń múra fún ìdánwò, wọ́n sì ń ka àwọn ìwé àtijọ́ lọ́jọ́ kọ̀ọ̀kan.",
      "ca" -> "El pagès va collir les pomes del camp i les va portar al mercat del poble abans que es fes fosc.",
      "et" -> "Kalur sõitis varahommikul merele ja tuli õhtuks tagasi koju värske kalaga, mida ta turul müüs.",
      "hr" -> "Vrtlar zalijeva cvijeće rano ujutro, a poslije podne obrezuje grmlje i skuplja lišće po cijelom vrtu.",
      "hu" -> "A halász kora reggel kievezett a tóra, és naplemente előtt friss halakkal tért vissza a faluba.",
      "lt" -> "Sodininkas anksti rytą laisto gėles, o po pietų geni krūmus ir grėbia lapus visame sode.",
      "lv" -> "Dārznieks agri no rīta laista puķes, bet pēcpusdienā apgriež krūmus un grābj lapas visā dārzā.",
      "ro" -> "Brutarul pregăteşte în fiecare noapte pâine proaspătă pe care sătenii o cumpără dis-de-dimineaţă din piaţă.",
      "sk" -> "Učiteľ rozprával žiakom o ôsmich planétach, kým sa pozerali cez ďalekohľad na nočnú oblohu.",
      "sl" -> "Ribič je zgodaj zjutraj odveslal na jezero in se pred mrakom vrnil v vas s svežimi ribami za večerjo.",
      "cs" -> "Každý večer čteme dětem pohádky a povídáme si o tom, co zažily ve školce během dne.",
      "da" -> "Køkkenet i det gamle hus blev bygget om sidste efterår, og nu bager vi brød hver søndag til hele familien.",
      "de" -> "Der Ingenieur prüfte die Brücke über den Fluss, bevor die schweren Lastwagen sie überqueren durften.",
      "en" -> "The library at the corner of the street opens early, and students often stay there until it closes at night.",
      "es" -> "El médico recomendó descansar varios días y beber mucha agua antes de volver al trabajo en la oficina.",
      "fi" -> "Järven rannalla seisoo vanha punainen mökki, jossa vietämme kesälomamme joka vuosi perheen kanssa.",
      "fr" -> "Le boulanger prépare chaque nuit des croissants et des baguettes que les habitants achètent dès l'aube.",
      "id" -> "Petani menanam padi di sawah ketika musim hujan tiba dan memanennya beberapa bulan kemudian bersama keluarga.",
      "it" -> "Il cuoco del ristorante prepara ogni giorno la pasta fresca con ingredienti del mercato vicino alla piazza.",
      "nl" -> "De fietser reed door het park langs de gracht en stopte bij de molen om een foto te maken van de lucht.",
      "no" -> "Fiskeren dro ut på fjorden tidlig om morgenen og kom tilbake med torsk og sei før mørket falt på.",
      "pl" -> "Ogrodnik podlewa kwiaty wczesnym rankiem, a później przycina krzewy i grabi liście w całym ogrodzie.",
      "pt" -> "O agricultor colheu as laranjas do pomar e levou-as ao mercado da aldeia para as vender ainda frescas.",
      "sv" -> "Läraren berättade för eleverna om stjärnorna och planeterna medan de tittade genom teleskopet på natten.",
      "tr" -> "Balıkçılar sabah erkenden denize açıldı ve akşam olmadan köye taze balıklarla geri döndüler.",
      "vi" -> "Người nông dân ra đồng từ sáng sớm để cấy lúa và trở về nhà khi mặt trời đã lặn sau dãy núi.")
    val preds = predict(heldOut.zipWithIndex.map { case ((_, t), i) => (i.toLong, t) })
    val confusions = heldOut.zipWithIndex.collect {
      case ((want, _), i) if preds(i.toLong) != want =>
        s"$want -> ${preds(i.toLong)}"
    }
    assert(confusions.isEmpty, s"misclassified: ${confusions.mkString(", ")}")
  }

  test("confusion matrix: Cyrillic, Arabic and Devanagari script buckets on held-out text (round 16)") {
    // VERDICT r15 #6: Cyrillic used to collapse to 'ru', Arabic script
    // to 'ar' (and Devanagari to 'hi') — wrong labels for uk/bg/sr,
    // fa/ur and mr/ne. The script ratio now routes into per-script
    // trigram profiles. None of these sentences appear in the profile
    // seeds; two per language.
    val heldOut: Seq[(String, String)] = Seq(
      "ru" -> "Осенью в парке дети собирают жёлтые листья и несут их домой, чтобы сделать красивый букет для бабушки.",
      "ru" -> "Зимой мы часто пьём горячий чай с мёдом и читаем старые книги у окна, пока идёт снег.",
      "uk" -> "Восени в парку діти збирають жовте листя та несуть його додому, щоб зробити гарний букет для бабусі.",
      "uk" -> "Взимку ми часто готуємо гарячий чай з медом і читаємо старі книжки біля вікна, коли падає сніг.",
      "bg" -> "През есента в парка децата събират жълти листа и ги носят вкъщи, за да направят красив букет за баба си.",
      "bg" -> "През зимата често пием горещ чай с мед и четем стари книги до прозореца, докато навън вали сняг.",
      "sr" -> "У јесен у парку деца скупљају жуто лишће и носе га кући да направе леп букет за баку.",
      "sr" -> "Зими често пијемо врућ чај са медом и читамо старе књиге поред прозора док напољу пада снег.",
      // round-19 Cyrillic additions (VERDICT r18 #3): be/mk are the
      // tight Slavic near-neighbors (be-vs-uk/ru, mk-vs-sr/bg); the
      // Turkic/Mongolic/Iranian rows (kk/ky/mn/tg) depend on the
      // widened U+0460–04FF normalization — before it their
      // discriminating letters collapsed and they labeled ru
      "be" -> "Увосень у парку дзеці збіраюць жоўтае лісце і нясуць яго дадому, каб зрабіць прыгожы букет для бабулі.",
      "be" -> "Узімку мы часта п'ём гарачую гарбату з мёдам і чытаем старыя кнігі каля акна, пакуль ідзе снег.",
      "kk" -> "Күзде саябақта балалар сары жапырақтарды жинап, әжелеріне әдемі гүл шоғын жасау үшін үйге алып барады.",
      "kk" -> "Қыста біз жиі балмен ыстық шай ішеміз және терезенің жанында ескі кітаптарды оқимыз, далада қар жауып тұрғанда.",
      "ky" -> "Күзүндө паркта балдар сары жалбырактарды чогултуп, чоң энесине кооз гүлдесте жасоо үчүн үйгө алып барышат.",
      "ky" -> "Кышында биз көп учурда бал менен ысык чай ичебиз жана терезенин жанында эски китептерди окуйбуз, сыртта кар жааганда.",
      "mk" -> "Наесен во паркот децата собираат жолти лисја и ги носат дома за да направат убав букет за баба си.",
      "mk" -> "Во зима често пиеме топол чај со мед и читаме стари книги покрај прозорецот додека надвор паѓа снег.",
      "mn" -> "Намар цэцэрлэгт хүрээлэнд хүүхдүүд шар навчис түүж, эмээдээ үзэсгэлэнтэй баглаа хийхээр гэртээ авчирдаг.",
      "mn" -> "Өвөлдөө бид ихэвчлэн зөгийн балтай халуун цай ууж, гадаа цас орох үед цонхны дэргэд хуучин ном уншдаг.",
      "tg" -> "Дар тирамоҳ кӯдакон дар боғ баргҳои зардро ҷамъ мекунанд ва ба хона мебаранд, то барои бибии худ гулдастаи зебо созанд.",
      "tg" -> "Дар зимистон мо аксар вақт чои гарм бо асал менӯшем ва дар назди тиреза китобҳои кӯҳнаро мехонем, вақте ки дар берун барф меборад.",
      // round-20 Cyrillic additions (VERDICT r19 #4): tt-vs-ba is the
      // adversarial Kipchak pair (shared register, discriminated by
      // tt җ vs ba ҙ/ҫ/ҡ); cv is structurally distant but used to
      // label ru
      "tt" -> "Көздә паркта балалар сары яфракларны җыялар һәм әбиләренә матур бәйләм ясар өчен өйгә алып кайталар.",
      "tt" -> "Кышын без еш кына бал белән кайнар чәй эчәбез һәм тәрәзә янында иске китаплар укыйбыз, урамда кар ява.",
      "ba" -> "Көҙөн паркта балалар һары япраҡтарҙы йыя һәм өләсәйҙәренә матур гөлләмә яһау өсөн өйгә алып ҡайта.",
      "ba" -> "Ҡышын беҙ йыш ҡына бал менән ҡайнар сәй эсәбеҙ һәм тәҙрә янында иҫке китаптар уҡыйбыҙ, тышта ҡар яуа.",
      "cv" -> "Кӗркунне паркра ачасем сарӑ ҫулҫӑсем пуҫтараҫҫӗ те асламӑшӗ валли илемлӗ ҫыхӑ тума киле илсе каяҫҫӗ.",
      "cv" -> "Хӗлле эпир час-часах пылпа вӗри чей ӗҫетпӗр те чӳрече умӗнче кивӗ кӗнекесем вулатпӑр, тулта юр ҫӑвать.",
      "ar" -> "في الخريف يجمع الأطفال أوراق الشجر الصفراء في الحديقة ويحملونها إلى البيت ليصنعوا باقة جميلة لجدتهم.",
      "ar" -> "في الشتاء نشرب الشاي الساخن مع العسل ونقرأ الكتب القديمة قرب النافذة بينما يتساقط الثلج في الخارج.",
      "fa" -> "در پاییز کودکان در پارک برگ های زرد را جمع می کنند و به خانه می برند تا دسته گلی زیبا برای مادربزرگ خود بسازند.",
      "fa" -> "در زمستان اغلب چای داغ با عسل می نوشیم و کتاب های کهنه را کنار پنجره می خوانیم در حالی که برف می بارد.",
      "ur" -> "خزاں میں بچے پارک میں پیلے پتے جمع کرتے ہیں اور گھر لے جاتے ہیں تاکہ اپنی دادی کے لیے خوبصورت گلدستہ بنائیں۔",
      "ur" -> "سردیوں میں ہم اکثر شہد کے ساتھ گرم چائے پیتے ہیں اور کھڑکی کے پاس پرانی کتابیں پڑھتے ہیں جب باہر برف گرتی ہے۔",
      // round-19 Arabic-script additions: ps (retroflex letters +
      // ې/ۍ/ږ/ښ discriminate against fa/ur), ckb (ە-heavy Sorani —
      // depends on the widened Arabic normalization)
      "ps" -> "په مني کې ماشومان په پارک کې ژېړې پاڼې راټولوي او کور ته يې وړي چې د خپلې انا لپاره ښکلې ګېډۍ جوړه کړي.",
      "ps" -> "په ژمي کې موږ ډېر ځله له شاتو سره ګرم چای څښو او د کړکۍ څنګ ته زاړه کتابونه لولو کله چې بهر واوره اوري.",
      "ckb" -> "لە پاییزدا منداڵان لە پارکەکەدا گەڵا زەردەکان کۆدەکەنەوە و دەیانبەنە ماڵەوە بۆ ئەوەی چەپکێکی جوان بۆ داپیرەیان دروست بکەن.",
      "ckb" -> "لە زستاندا زۆر جار چای گەرم لەگەڵ هەنگوین دەخۆینەوە و لە تەنیشت پەنجەرەکە کتێبە کۆنەکان دەخوێنینەوە کاتێک بەفر دەبارێت.",
      // round-20 Arabic-script additions (VERDICT r19 #4): ug's
      // vowelled orthography and sd's implosive letters — both used
      // to label ar/fa/ur
      "ug" -> "كۈزدە بالىلار باغچىدا سېرىق يوپۇرماقلارنى يىغىپ، مومىسىغا چىرايلىق گۈل باغلىمى ياساش ئۈچۈن ئۆيگە ئېلىپ بارىدۇ.",
      "ug" -> "قىشتا بىز دائىم ھەسەل بىلەن ئىسسىق چاي ئىچىمىز ۋە دېرىزە يېنىدا كونا كىتابلارنى ئوقۇيمىز، سىرتتا قار ياغىدۇ.",
      "sd" -> "سرءُ ۾ ٻار پارڪ ۾ پيلا پن گڏ ڪن ٿا ۽ ڏاڏيءَ لاءِ سهڻو گلدستو ٺاهڻ لاءِ گهر کڻي وڃن ٿا.",
      "sd" -> "سياري ۾ اسين اڪثر ماکيءَ سان گرم چانهه پيئون ٿا ۽ دريءَ ڀرسان پراڻا ڪتاب پڙهون ٿا، جڏهن ٻاهر برف پوي ٿي.",
      "hi" -> "शरद ऋतु में बच्चे बगीचे में पीले पत्ते इकट्ठा करते हैं और दादी के लिए सुंदर गुलदस्ता बनाने घर ले जाते हैं।",
      "hi" -> "सर्दियों में हम अक्सर शहद के साथ गर्म चाय पीते हैं और खिड़की के पास पुरानी किताबें पढ़ते हैं।",
      "mr" -> "शरद ऋतूत मुले बागेत पिवळी पाने गोळा करतात आणि आजीसाठी सुंदर पुष्पगुच्छ करण्यासाठी घरी नेतात.",
      "mr" -> "हिवाळ्यात आम्ही अनेकदा मधासोबत गरम चहा पितो आणि खिडकीजवळ जुनी पुस्तके वाचतो.",
      "ne" -> "शरद ऋतुमा केटाकेटीहरू बगैंचामा पहेंला पातहरू बटुल्छन् र हजुरआमाका लागि राम्रो गुच्छा बनाउन घर लैजान्छन्।",
      "ne" -> "जाडोमा हामी प्रायः महसँग तातो चिया पिउँछौं र झ्यालनजिकै पुराना किताबहरू पढ्छौं।")
    val preds = predict(heldOut.zipWithIndex.map { case ((_, t), i) => (i.toLong, t) })
    val confusions = heldOut.zipWithIndex.collect {
      case ((want, _), i) if preds(i.toLong) != want =>
        s"$want -> ${preds(i.toLong)}"
    }
    assert(confusions.isEmpty, s"misclassified: ${confusions.mkString(", ")}")
    // the Latin tier is untouched by the script buckets
    val latin = predict(Seq(
      100L -> "The weather was fine and the children played outside all afternoon in the garden."))
    assert(latin(100L) == "en")
  }

  test("confusion matrix: Greek, Hebrew and Bengali single-language script buckets (round 17)") {
    // VERDICT r16 #3: Greek and Hebrew text used to normalize to
    // nothing in every trigram bucket and exit via the Latin
    // zero-trigram prior as 'en' — a wrong label. The script ratio now
    // decides el/he/bn outright (single-language buckets); two
    // held-out sentences per language, plus monotonic/polytonic Greek.
    val heldOut: Seq[(String, String)] = Seq(
      "el" -> "Το φθινόπωρο τα παιδιά μαζεύουν κίτρινα φύλλα στο πάρκο και τα πηγαίνουν σπίτι για να φτιάξουν ένα όμορφο μπουκέτο για τη γιαγιά τους.",
      "el" -> "Τον χειμώνα πίνουμε συχνά ζεστό τσάι με μέλι και διαβάζουμε παλιά βιβλία δίπλα στο παράθυρο όσο χιονίζει έξω.",
      "he" -> "בסתיו הילדים אוספים עלים צהובים בפארק ולוקחים אותם הביתה כדי להכין זר יפה לסבתא שלהם.",
      "he" -> "בחורף אנחנו שותים לעתים קרובות תה חם עם דבש וקוראים ספרים ישנים ליד החלון כשיורד שלג בחוץ.",
      "bn" -> "শরৎকালে শিশুরা পার্কে হলুদ পাতা কুড়িয়ে বাড়িতে নিয়ে যায় যাতে দাদির জন্য সুন্দর একটি তোড়া বানাতে পারে।",
      "bn" -> "শীতকালে আমরা প্রায়ই মধু দিয়ে গরম চা খাই এবং বাইরে তুষার পড়ার সময় জানালার পাশে পুরনো বই পড়ি।")
    val preds = predict(heldOut.zipWithIndex.map { case ((_, t), i) => (i.toLong, t) })
    val confusions = heldOut.zipWithIndex.collect {
      case ((want, _), i) if preds(i.toLong) != want =>
        s"$want -> ${preds(i.toLong)}"
    }
    assert(confusions.isEmpty, s"misclassified: ${confusions.mkString(", ")}")
    // the neighboring script buckets and the Latin tier are untouched
    val controls = predict(Seq(
      200L -> "Μουσική και τέχνη παίζουν σημαντικό ρόλο στη ζωή πολλών ανθρώπων σε όλο τον κόσμο.",
      201L -> "המוזיקה והאמנות ממלאות תפקיד חשוב בחייהם של אנשים רבים בכל העולם.",
      202L -> "সংগীত ও শিল্প বহু মানুষের জীবনে গুরুত্বপূর্ণ ভূমিকা পালন করে।",
      203L -> "The weather was fine and the children played outside all afternoon.",
      204L -> "दिल्ली भारत की राजधानी है और यहाँ बहुत से लोग रहते हैं।"))
    assert(controls(200L) == "el" && controls(201L) == "he" &&
      controls(202L) == "bn" && controls(203L) == "en" &&
      controls(204L) == "hi")
  }

  test("confusion matrix: the Bengali-script trigram bucket (bn/as) on held-out text") {
    // the VERDICT r16 "as later" path: the Bengali block carries
    // Bengali AND Assamese, so the script ratio now routes into a
    // bn/as trigram bucket instead of collapsing to bn. None of these
    // sentences appear in the profile seeds; two per language.
    val heldOut: Seq[(String, String)] = Seq(
      "bn" -> "শরৎকালে শিশুরা পার্কে হলুদ পাতা কুড়িয়ে বাড়িতে নিয়ে যায় যাতে দাদির জন্য সুন্দর একটি তোড়া বানাতে পারে।",
      "bn" -> "শীতকালে আমরা প্রায়ই মধু দিয়ে গরম চা খাই এবং বাইরে তুষার পড়ার সময় জানালার পাশে পুরনো বই পড়ি।",
      "as" -> "শৰৎ কালত ল'ৰা-ছোৱালীবোৰে উদ্যানত হালধীয়া পাত গোটাই আইতাৰ বাবে ধুনীয়া ফুলৰ থোপা বনাবলৈ ঘৰলৈ লৈ যায়।",
      "as" -> "জাৰ কালত আমি সঘনাই মৌৰ সৈতে গৰম চাহ খাওঁ আৰু খিৰিকীৰ কাষত বহি পুৰণি কিতাপ পঢ়োঁ।")
    val preds = predict(heldOut.zipWithIndex.map { case ((_, t), i) => (i.toLong, t) })
    val confusions = heldOut.zipWithIndex.collect {
      case ((want, _), i) if preds(i.toLong) != want =>
        s"$want -> ${preds(i.toLong)}"
    }
    assert(confusions.isEmpty, s"misclassified: ${confusions.mkString(", ")}")
    // neighbors unaffected: Odia keeps its own block, Devanagari
    // routing and the Latin tier untouched
    val controls = predict(Seq(
      400L -> "ଶୀତଦିନେ ଆମେ ପ୍ରାୟତଃ ମହୁ ସହିତ ଗରମ ଚା ପିଉ ଏବଂ ଝରକା ପାଖରେ ପୁରୁଣା ବହି ପଢ଼ୁ।",
      401L -> "दिल्ली भारत की राजधानी है और यहाँ बहुत से लोग रहते हैं।",
      402L -> "The weather was fine and the children played outside all afternoon."))
    assert(controls(400L) == "or" && controls(401L) == "hi" &&
      controls(402L) == "en")
  }

  test("confusion matrix: the Ethiopic-script trigram bucket (am/ti) on held-out text (round 18)") {
    // VERDICT r17 #5: round 17 documented the Ethiopic→am collapse
    // (Tigrinya shares the block); the script ratio now routes into an
    // am/ti trigram bucket — the bn/as pattern. None of these
    // sentences appear in the profile seeds; two per language.
    val heldOut: Seq[(String, String)] = Seq(
      "am" -> "በክረምት ብዙ ጊዜ ሙቅ ሻይ ከማር ጋር እንጠጣለን እና በመስኮቱ አጠገብ የድሮ መጻሕፍትን እናነባለን።",
      "am" -> "አሣ አጥማጆች በማለዳ ወደ ባሕር ወጡ እና ምሽት ላይ ትኩስ ዓሣ ይዘው ወደ መንደሩ ተመለሱ።",
      "ti" -> "ኣብ ክረምቲ ብዙሕ ግዜ ምስ መዓር ውዑይ ሻሂ ንሰቲ ኣብ ጥቓ መስኮት ከኣ ኣረጊት መጻሕፍቲ ነንብብ።",
      "ti" -> "ገፈፍቲ ዓሳ ንግሆ ኣንጊሆም ናብ ባሕሪ ወጹ ምሸት ከኣ ትኩስ ዓሳ ሒዞም ናብታ ዓዲ ተመልሱ።")
    val preds = predict(heldOut.zipWithIndex.map { case ((_, t), i) => (i.toLong, t) })
    val confusions = heldOut.zipWithIndex.collect {
      case ((want, _), i) if preds(i.toLong) != want =>
        s"$want -> ${preds(i.toLong)}"
    }
    assert(confusions.isEmpty, s"misclassified: ${confusions.mkString(", ")}")
    // neighbors unaffected: Hebrew and Greek keep their single-language
    // blocks, the Latin tier is untouched
    val controls = predict(Seq(
      500L -> "בסתיו הילדים אוספים עלים צהובים בפארק ולוקחים אותם הביתה.",
      501L -> "The weather was fine and the children played outside all afternoon."))
    assert(controls(500L) == "he" && controls(501L) == "en")
  }

  test("confusion matrix: the round-17 single-language script blocks on held-out text") {
    // ta te kn ml gu pa or si ka hy lo km my — each block carries
    // one servable language, decided by script ratio alone (the same
    // mechanism as el/he). Before round 17, all of these normalized to
    // nothing in every trigram bucket and exited as 'en'. (Ethiopic
    // left this list in round 18 — it routes into the am/ti trigram
    // bucket, tested below.)
    val heldOut: Seq[(String, String)] = Seq(
      "ta" -> "குளிர்காலத்தில் நாங்கள் அடிக்கடி தேனுடன் சூடான தேநீர் குடித்து ஜன்னல் அருகில் பழைய புத்தகங்களை படிக்கிறோம்.",
      "te" -> "శీతాకాలంలో మేము తరచుగా తేనెతో వేడి టీ తాగుతూ కిటికీ పక్కన పాత పుస్తకాలు చదువుతాము.",
      "kn" -> "ಚಳಿಗಾಲದಲ್ಲಿ ನಾವು ಆಗಾಗ ಜೇನುತುಪ್ಪದೊಂದಿಗೆ ಬಿಸಿ ಚಹಾ ಕುಡಿದು ಕಿಟಕಿಯ ಪಕ್ಕ ಹಳೆಯ ಪುಸ್ತಕಗಳನ್ನು ಓದುತ್ತೇವೆ.",
      "ml" -> "ശൈത്യകാലത്ത് ഞങ്ങൾ പലപ്പോഴും തേനോടുകൂടിയ ചൂടുള്ള ചായ കുടിച്ച് ജനലിനരികിൽ പഴയ പുസ്തകങ്ങൾ വായിക്കുന്നു.",
      "gu" -> "શિયાળામાં અમે ઘણીવાર મધ સાથે ગરમ ચા પીએ છીએ અને બારી પાસે જૂનાં પુસ્તકો વાંચીએ છીએ.",
      "pa" -> "ਸਰਦੀਆਂ ਵਿੱਚ ਅਸੀਂ ਅਕਸਰ ਸ਼ਹਿਦ ਨਾਲ ਗਰਮ ਚਾਹ ਪੀਂਦੇ ਹਾਂ ਅਤੇ ਖਿੜਕੀ ਕੋਲ ਪੁਰਾਣੀਆਂ ਕਿਤਾਬਾਂ ਪੜ੍ਹਦੇ ਹਾਂ।",
      "or" -> "ଶୀତଦିନେ ଆମେ ପ୍ରାୟତଃ ମହୁ ସହିତ ଗରମ ଚା ପିଉ ଏବଂ ଝରକା ପାଖରେ ପୁରୁଣା ବହି ପଢ଼ୁ।",
      "si" -> "ශීත කාලයේදී අපි බොහෝ විට මී පැණි සමඟ උණුසුම් තේ බොමින් ජනේලය අසල පරණ පොත් කියවමු.",
      "ka" -> "ზამთარში ჩვენ ხშირად ვსვამთ ცხელ ჩაის თაფლით და ვკითხულობთ ძველ წიგნებს ფანჯარასთან.",
      "hy" -> "Ձմռանը մենք հաճախ տաք թեյ ենք խմում մեղրով և հին գրքեր կարդում պատուհանի մոտ։",
      "lo" ->"ໃນລະດູໜາວ ພວກເຮົາມັກດື່ມຊາຮ້ອນກັບນໍ້າເຜິ້ງ ແລະ ອ່ານປຶ້ມເກົ່າຢູ່ຂ້າງປ່ອງຢ້ຽມ.",
      "km" -> "នៅរដូវរងារ យើងច្រើនតែផឹកតែក្តៅជាមួយទឹកឃ្មុំ ហើយអានសៀវភៅចាស់នៅក្បែរបង្អួច។",
      "my" -> "ဆောင်းရာသီတွင် ကျွန်ုပ်တို့သည် ပျားရည်နှင့် လက်ဖက်ရည်ပူကို မကြာခဏ သောက်ပြီး ပြတင်းပေါက်အနီးတွင် စာအုပ်ဟောင်းများကို ဖတ်ကြသည်။")
    val preds = predict(heldOut.zipWithIndex.map { case ((_, t), i) => (i.toLong, t) })
    val confusions = heldOut.zipWithIndex.collect {
      case ((want, _), i) if preds(i.toLong) != want =>
        s"$want -> ${preds(i.toLong)}"
    }
    assert(confusions.isEmpty, s"misclassified: ${confusions.mkString(", ")}")
    // neighboring blocks untouched: Bengali stays bn (Odia is a
    // DIFFERENT block), Thai stays th (Lao is a different block),
    // Devanagari trigram routing and the Latin tier are unaffected —
    // note pa/or sentences end in Devanagari danda '।' (one deva char,
    // far below the ratio gate)
    val controls = predict(Seq(
      300L -> "শরৎকালে শিশুরা পার্কে হলুদ পাতা কুড়ায় এবং বাড়িতে নিয়ে যায়।",
      301L -> "อากาศในฤดูหนาวเย็นมาก เราจึงดื่มชาร้อนและอ่านหนังสือเก่าข้างหน้าต่าง",
      302L -> "दिल्ली भारत की राजधानी है और यहाँ बहुत से लोग रहते हैं।",
      303L -> "The weather was fine and the children played outside all afternoon."))
    assert(controls(300L) == "bn" && controls(301L) == "th" &&
      controls(302L) == "hi" && controls(303L) == "en")
  }

  test("profiles are deterministic literals with sane shape") {
    val p = LangId.Profiles
    assert(p.keySet == LangId.TrigramLangs.toSet)
    p.foreach { case (_, entries) =>
      assert(entries.nonEmpty && entries.size <= LangId.ProfileK)
      // every weight is a scaled log-prob: negative, above the penalty
      assert(entries.forall { case (t, w) =>
        t.length == 3 && w < 0 && w > LangId.Penalty })
    }
    // recomputing yields the identical profile (determinism)
    assert(LangId.Profiles == p)
  }

  test("scores are integer-exact: expression matches a driver-side replay") {
    import spark.implicits._
    val text = "The quick brown fox jumps over the lazy dog near the river bank."
    val df = Seq((1L, text)).toDF("doc_id", "text")
    val row = LangId.detect(df, "doc_id", "text")
      .select(LangId.TrigramLangs.map(l => col(s"score_$l")): _*).head()
    val norm = LangId.normalizeJvm(text)
    val cps = norm.codePoints().toArray
    val expected = Array.fill(LangId.TrigramLangs.size)(0L)
    for (i <- 0 to cps.length - 3) {
      val w = LangId.CombinedProfile.get(new String(cps, i, 3))
      for (j <- expected.indices)
        expected(j) += (if (w == null) LangId.Penalty else w(j))
    }
    for (j <- expected.indices) assert(row.getLong(j) == expected(j))
  }
}
